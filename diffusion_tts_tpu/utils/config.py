"""Config plumbing: EasyDict, dotted-path reflection, and typed search params.

Replaces the reference's three config mechanisms (argparse CLI, click CLIs,
dnnlib EasyDict+reflection — SURVEY.md §5) with one small, typed layer.
``EasyDict``/``construct_class_by_name`` keep API familiarity with the
reference's dnnlib (dnnlib/util.py:39-52,235-303) for training configs;
``SearchParams`` is the typed equivalent of SamplingParams (edm/main.py:35-43).
"""
from __future__ import annotations

import dataclasses
import importlib
from typing import Any


class EasyDict(dict):
    """Dict with attribute access (reference dnnlib/util.py:39-52)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


def get_obj_by_name(name: str) -> Any:
    """Resolve 'pkg.module.Attr' to the attribute (dnnlib/util.py:286-289)."""
    module_name, _, attr = name.rpartition(".")
    if not module_name:
        raise ValueError(f"not a dotted path: {name!r}")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def call_func_by_name(*args, func_name: str, **kwargs) -> Any:
    return get_obj_by_name(func_name)(*args, **kwargs)


def construct_class_by_name(*args, class_name: str, **kwargs) -> Any:
    """NVIDIA's config-as-constructor-kwargs pattern (dnnlib/util.py:300-303)."""
    return get_obj_by_name(class_name)(*args, **kwargs)


@dataclasses.dataclass(frozen=True)
class SearchParams:
    """Search hyperparameters; the typed SamplingParams (edm/main.py:35-43).

    N: candidates per expansion; K: local-search iterations per timestep;
    B: beam width / batch copies; S: MCTS iterations per timestep;
    lambda_: zero-order perturbation scale; eps: eps-greedy explore prob.
    Defaults follow the unified CLI (main.py:90-95).
    """

    N: int = 4
    K: int = 20
    B: int = 2
    S: int = 8
    lambda_: float = 0.15
    eps: float = 0.4

    def replace(self, **kwargs) -> "SearchParams":
        return dataclasses.replace(self, **kwargs)


__all__ = [
    "EasyDict",
    "get_obj_by_name",
    "call_func_by_name",
    "construct_class_by_name",
    "SearchParams",
]
