"""MCTS over noise trajectories, TPU-native.

Behavioral counterpart of the EDM reference's per-timestep MCTS
(edm/main.py:405-713) — the complete implementation (the SD one never
scores simulations or updates visits, SURVEY.md §2b; here one correct
engine serves both backends):

  per timestep: (1) expand the root with b noise candidates if unexpanded;
  (2) run S rollouts: UCB1 selection (exploit r/v + explore
  sqrt(2 ln v_parent / v_child), unvisited = +inf) down the persisted tree,
  expansion of the reached leaf with b children using a per-depth noise
  table (edm/main.py:437-447 — the same table is reused by every expansion
  at a depth), a random child pick, then a ZERO-NOISE deterministic rollout
  to t=0 whose terminal score is backpropagated along the path;
  (3) advance the root to the child with best average reward. The tree
  (and its statistics) persists across timesteps.

TPU re-architecture (SURVEY.md §7 hard part 2): the dict-of-tensors tree
becomes fixed-capacity per-sample arrays with a leading batch axis —
states [B, MAXN, ...], children [B, MAXN, b], visits/rewards [B, MAXN] —
so selection is vectorized gathers, expansion is one batched denoise of
B*b candidates, and all rollouts of a phase run as one batched trajectory.

``rollout_batch`` controls how many rollouts share pre-phase UCB statistics
(selection still sees tree growth, but visit counts update only at phase
end). The reference batches up to 16 simulations this way
(edm/main.py:518-520), which with default S=8 means ALL rollouts of a
timestep see stale stats; rollout_batch=1 gives textbook sequential MCTS
(better rewards, less step-level parallelism). Cost note: every phase after
the first pays one fully-masked pipeline-fill expand (two wasted UNet
forwards), so rollout_batch < S trades compute for statistical freshness —
with rollout_batch=1 the per-timestep expand count doubles vs one phase.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffusion_tts_tpu.search.noise import (
    SALT_MCTS_EXPAND as _SALT_EXPAND,
    SALT_MCTS_PICK as _SALT_PICK,
    SALT_MCTS_TAB as _SALT_TAB,
    InjectedNoise,
)
from diffusion_tts_tpu.utils.config import SearchParams
from diffusion_tts_tpu.utils.rng import fold_in_path

_NEG_INF = jnp.float32(-1e30)
_POS_INF = jnp.float32(1e30)


class MCTSResult(NamedTuple):
    x: jax.Array  # terminal latents [B, ...]


class _Tree(NamedTuple):
    states: jax.Array  # [B, MAXN, *feat]
    parent: jax.Array  # [B, MAXN] int32
    depth: jax.Array  # [B, MAXN] int32
    children: jax.Array  # [B, MAXN, b] int32, -1 = empty
    n_children: jax.Array  # [B, MAXN] int32
    reward: jax.Array  # [B, MAXN] float32
    visits: jax.Array  # [B, MAXN] int32
    count: jax.Array  # [] int32 (synchronized across samples)
    root: jax.Array  # [B] int32


def _mcts_dims(params: SearchParams, rollout_batch: int | None):
    b_exp = params.N  # branching factor (reference: b = method_params.N)
    s_rollouts = params.S  # rollouts per timestep (reference: N = method_params.S)
    if rollout_batch is None:
        rollout_batch = s_rollouts  # reference's batched-simulation semantics
    rollout_batch = min(rollout_batch, s_rollouts)
    n_phases = -(-s_rollouts // rollout_batch)
    return b_exp, rollout_batch, n_phases


def mcts_init(
    backend,
    z: jax.Array,
    key: jax.Array,
    params: SearchParams,
    *,
    rollout_batch: int | None = None,
    noise: InjectedNoise | None = None,
) -> tuple[_Tree, jax.Array]:
    """Allocate the fixed-capacity tree arena and the per-depth noise table.
    Split from mcts_search so run_search(dispatch="per_step") can drive one
    mcts_timestep per device dispatch."""
    b_exp, rollout_batch, n_phases = _mcts_dims(params, rollout_batch)
    bsz = z.shape[0]
    num_steps = backend.num_steps
    feat_shape = z.shape[1:]
    # Arena slots actually consumed: expand_nodes only advances the shared
    # count when some sample expands, so fully-masked pipeline-fill
    # iterations (q=0 of every phase after the first) are slot-free — per
    # timestep at most one root expansion plus rollout_batch leaf expansions
    # per phase. (The masked fill iteration still pays its two UNet
    # forwards; with the default rollout_batch=S — one phase — there are no
    # such iterations, see mcts_timestep's pipelining note.)
    maxn = 1 + num_steps * (1 + n_phases * rollout_batch) * b_exp

    x0 = backend.init_latents(z)
    # per-depth noise table, drawn once (edm/main.py:437-447); injectable
    # like the reference's precomputed_noise[i] broadcast (edm/main.py:441-443)
    if noise is not None and noise.mcts_table is not None:
        noise_tab = noise.mcts_table.astype(jnp.float32)
    else:
        noise_tab = jax.random.normal(
            fold_in_path(key, _SALT_TAB), (num_steps, bsz, b_exp) + feat_shape, jnp.float32
        )

    tree = _Tree(
        states=jnp.zeros((bsz, maxn) + feat_shape, jnp.float32).at[:, 0].set(x0),
        parent=jnp.full((bsz, maxn), -1, jnp.int32),
        depth=jnp.zeros((bsz, maxn), jnp.int32),
        children=jnp.full((bsz, maxn, b_exp), -1, jnp.int32),
        n_children=jnp.zeros((bsz, maxn), jnp.int32),
        reward=jnp.zeros((bsz, maxn), jnp.float32).at[:, 0].set(0.0),
        visits=jnp.zeros((bsz, maxn), jnp.int32).at[:, 0].set(1),
        count=jnp.asarray(1, jnp.int32),
        root=jnp.zeros((bsz,), jnp.int32),
    )
    return tree, noise_tab


def mcts_result(tree: _Tree) -> MCTSResult:
    b_idx = jnp.arange(tree.parent.shape[0])
    return MCTSResult(x=tree.states[b_idx, tree.root])


def mcts_timestep(
    backend,
    tree: _Tree,
    noise_tab: jax.Array,
    key: jax.Array,
    i: jax.Array,
    params: SearchParams,
    *,
    rollout_batch: int | None = None,
    fresh_expansion: bool = False,
) -> _Tree:
    """One MCTS timestep: (pipelined) root/leaf expansions, rollout phases
    with terminal scoring + backprop, then root advance. `i` may be a traced
    scalar, so one compile serves every timestep.

    fresh_expansion=True draws NEW expansion noise per (timestep, phase,
    iteration) instead of the reference's fixed per-depth table
    (edm/main.py:437-447) — a beyond-reference mode: with the table, every
    expansion of a node at depth d proposes the SAME b_exp children, so
    extra rollouts can only refine value estimates, never widen the tree."""
    b_exp, rollout_batch, n_phases = _mcts_dims(params, rollout_batch)
    bsz = tree.parent.shape[0]
    num_steps = backend.num_steps
    feat_shape = tree.states.shape[2:]
    feat_ndim = len(feat_shape)
    max_path = num_steps + 2
    b_idx = jnp.arange(bsz)

    def expand_nodes(tree: _Tree, nodes: jax.Array, do_expand: jax.Array,
                     eps_override: jax.Array | None = None) -> _Tree:
        """Add b_exp children to `nodes` [B] where do_expand [B]; always
        consumes b_exp slots (masked writes keep unexpanded lanes intact)."""
        d = tree.depth[b_idx, nodes]  # [B]
        x_par = tree.states[b_idx, nodes]  # [B, *feat]
        if eps_override is not None:
            eps = eps_override  # [B, b_exp, *feat]
        else:
            eps = jnp.take_along_axis(
                noise_tab,
                jnp.clip(d, 0, num_steps - 1).reshape((1, bsz, 1) + (1,) * feat_ndim),
                axis=0,
            )[0]  # [B, b_exp, *feat]
        # Candidate-major flatten ([cand, sample] -> cand*B) to match
        # backend.expand's layout: per-sample conditioning closures tile
        # labels as [l0..lB-1]*n, so sample must be the fast axis.
        d_clip = jnp.clip(d, 0, num_steps - 1)
        x_flat = jnp.broadcast_to(
            x_par[None], (b_exp, bsz) + feat_shape
        ).reshape((b_exp * bsz,) + feat_shape)
        eps_flat = jnp.moveaxis(eps, 0, 1).reshape((b_exp * bsz,) + feat_shape)
        d_flat = jnp.tile(d_clip, b_exp)
        aux = backend.base_step(x_flat, d_flat)
        child_states = backend.advance(x_flat, d_flat, aux, eps_flat)
        child_states = jnp.moveaxis(
            child_states.reshape((b_exp, bsz) + feat_shape), 0, 1
        )  # [B, b_exp, *feat]

        new_ids = tree.count + jnp.arange(b_exp, dtype=jnp.int32)  # [b]
        ids_b = jnp.broadcast_to(new_ids, (bsz, b_exp))
        mask = do_expand[:, None]
        maskf = do_expand.reshape((bsz,) + (1,) * (feat_ndim + 1))

        states = jax.lax.dynamic_update_slice(
            tree.states,
            jnp.where(
                maskf,
                child_states,
                jax.lax.dynamic_slice(
                    tree.states, (0, tree.count) + (0,) * feat_ndim,
                    (bsz, b_exp) + feat_shape,
                ),
            ),
            (0, tree.count) + (0,) * feat_ndim,
        )
        upd = lambda arr, val: jax.lax.dynamic_update_slice(
            arr,
            jnp.where(
                mask, val,
                jax.lax.dynamic_slice(arr, (0, tree.count), (bsz, b_exp)),
            ),
            (0, tree.count),
        )
        parent = upd(tree.parent, jnp.broadcast_to(nodes[:, None], (bsz, b_exp)))
        depth = upd(tree.depth, jnp.broadcast_to((d + 1)[:, None], (bsz, b_exp)))
        reward = upd(tree.reward, jnp.zeros((bsz, b_exp), jnp.float32))
        visits = upd(tree.visits, jnp.zeros((bsz, b_exp), jnp.int32))
        slot_idx = jnp.arange(b_exp)[None, :]
        current = tree.children[b_idx[:, None], nodes[:, None], slot_idx]
        children = tree.children.at[b_idx[:, None], nodes[:, None], slot_idx].set(
            jnp.where(mask, ids_b, current)  # preserve untouched lanes
        )
        n_children = tree.n_children.at[b_idx, nodes].set(
            jnp.where(do_expand, b_exp, tree.n_children[b_idx, nodes])
        )
        return tree._replace(
            states=states, parent=parent, depth=depth, children=children,
            n_children=n_children, reward=reward, visits=visits,
            # advance the shared slot counter only if some sample expanded:
            # fully-masked calls (pipeline-fill iterations) are slot-free,
            # which is what lets mcts_init size the arena at the unpipelined
            # bound instead of one fill slot per phase
            count=tree.count + b_exp * jnp.any(do_expand).astype(jnp.int32),
        )

    def select_path(tree: _Tree) -> tuple[jax.Array, jax.Array, jax.Array]:
        """UCB descent from root. Returns (leaf [B], path [B, max_path],
        path_len [B]). path[:,0] = root."""
        path = jnp.full((bsz, max_path), -1, jnp.int32).at[:, 0].set(tree.root)

        def body(t, carry):
            node, path, plen, active = carry
            ch = tree.children[b_idx, node]  # [B, b]
            valid = ch >= 0
            ch_safe = jnp.maximum(ch, 0)
            v_c = tree.visits[b_idx[:, None], ch_safe].astype(jnp.float32)
            r_c = tree.reward[b_idx[:, None], ch_safe]
            v_p = jnp.maximum(tree.visits[b_idx, node].astype(jnp.float32), 1.0)
            explore = jnp.sqrt(2.0 * jnp.log(v_p)[:, None] / jnp.maximum(v_c, 1.0))
            ucb = jnp.where(v_c == 0, _POS_INF, r_c / jnp.maximum(v_c, 1.0) + explore)
            ucb = jnp.where(valid, ucb, _NEG_INF)
            sel = jnp.argmax(ucb, axis=1)
            nxt = ch_safe[b_idx, sel]
            node_new = jnp.where(active, nxt, node)
            path = path.at[b_idx, jnp.where(active, t + 1, max_path - 1)].set(
                jnp.where(active, node_new, path[:, max_path - 1])
            )
            plen = plen + active.astype(jnp.int32)
            active = active & (tree.n_children[b_idx, node_new] > 0)
            return node_new, path, plen, active

        active0 = tree.n_children[b_idx, tree.root] > 0
        node, path, plen, _ = jax.lax.fori_loop(
            0, num_steps + 1, body, (tree.root, path, jnp.ones((bsz,), jnp.int32), active0)
        )
        return node, path, plen

    # Root expansion (edm/main.py:464-514) is pipelined into the rollout
    # scan: iteration q expands the node selected at iteration q-1 (the
    # root at q=0 when unexpanded), so root- and leaf-expansion share ONE
    # expand_nodes instantiation — the compile-heavy subgraph (two Heun
    # UNet forwards) appears once in the timestep body instead of twice.
    # Op ordering is identical to the unpipelined form: each selection
    # still runs after the previous rollout's leaf expansion, and
    # backprop still happens at phase end (stale-stats semantics).
    # Cost note: every scan iteration pays the (possibly masked) expand;
    # with rollout_batch < S each extra phase adds one masked fill slot,
    # so the default rollout_batch=S (one phase — the reference's
    # batched-simulation semantics) is the cost-neutral configuration.
    def phase_body(tree: _Tree, phase: jax.Array) -> tuple[_Tree, None]:
        def iter_body(carry, q):
            tree, leaf, pend_mask, path, plen = carry
            first_child = tree.count  # ids of the children about to be added
            eps_override = (
                jax.random.normal(
                    fold_in_path(key, _SALT_EXPAND, i, phase, q),
                    (bsz, b_exp) + feat_shape, jnp.float32,
                ) if fresh_expansion else None
            )
            tree = expand_nodes(tree, leaf, pend_mask, eps_override)
            # complete rollout q-1 (no-op garbage at q=0, sliced off below)
            pick = jax.random.randint(
                fold_in_path(key, _SALT_PICK, i, phase, q - 1), (bsz,), 0, b_exp
            )
            was_leaf_expand = pend_mask & (q > 0)
            node = jnp.where(was_leaf_expand, first_child + pick, leaf)
            path = path.at[b_idx, jnp.where(was_leaf_expand, plen, max_path - 1)].set(
                jnp.where(was_leaf_expand, node, path[:, max_path - 1])
            )
            plen = plen + was_leaf_expand.astype(jnp.int32)
            sim_x = tree.states[b_idx, node]
            sim_d = tree.depth[b_idx, node]
            out = (sim_x, sim_d, path)
            # select the next leaf to expand (discarded at q=rollout_batch)
            leaf_n, path_n, plen_n = select_path(tree)
            do_expand = tree.depth[b_idx, leaf_n] < num_steps - 1
            return (tree, leaf_n, do_expand, path_n, plen_n), out

        need_root = (tree.n_children[b_idx, tree.root] == 0) & (phase == 0)
        carry0 = (
            tree, tree.root, need_root,
            jnp.full((bsz, max_path), -1, jnp.int32).at[:, 0].set(tree.root),
            jnp.ones((bsz,), jnp.int32),
        )
        (tree, *_), (sim_x, sim_d, paths) = jax.lax.scan(
            iter_body, carry0, jnp.arange(rollout_batch + 1, dtype=jnp.int32)
        )
        # drop the q=0 pipeline-fill slot (root expansion, no rollout)
        sim_x, sim_d, paths = sim_x[1:], sim_d[1:], paths[1:]
        # batched zero-noise simulations (edm/main.py:616-645)
        r = rollout_batch
        sim_x_flat = sim_x.reshape((r * bsz,) + feat_shape)
        sim_d_flat = sim_d.reshape(r * bsz)
        images = backend.rollout(sim_x_flat, sim_d_flat)
        rewards = backend.score(images).reshape(r, bsz)

        # deferred backprop (stale-stats semantics, edm/main.py:661-681)
        def backprop(tree: _Tree, inp):
            path, rew = inp  # [B, max_path], [B]
            def slot(s, tr):
                idx = path[:, s]
                ok = idx >= 0
                idx_safe = jnp.maximum(idx, 0)
                reward = tr.reward.at[b_idx, idx_safe].add(jnp.where(ok, rew, 0.0))
                visits = tr.visits.at[b_idx, idx_safe].add(jnp.where(ok, 1, 0))
                return tr._replace(reward=reward, visits=visits)
            tree = jax.lax.fori_loop(0, max_path, slot, tree)
            return tree, None

        tree, _ = jax.lax.scan(backprop, tree, (paths, rewards))
        return tree, None

    tree, _ = jax.lax.scan(
        phase_body, tree, jnp.arange(n_phases, dtype=jnp.int32)
    )

    # (3) advance root to best-avg-reward child (edm/main.py:684-703)
    ch = tree.children[b_idx, tree.root]
    valid = ch >= 0
    ch_safe = jnp.maximum(ch, 0)
    v = tree.visits[b_idx[:, None], ch_safe].astype(jnp.float32)
    rew = tree.reward[b_idx[:, None], ch_safe]
    avg = jnp.where(valid & (v > 0), rew / jnp.maximum(v, 1.0), _NEG_INF)
    best = jnp.argmax(avg, axis=1)
    new_root = ch_safe[b_idx, best]
    return tree._replace(root=new_root)


def mcts_search(
    backend,
    z: jax.Array,
    key: jax.Array,
    params: SearchParams,
    *,
    rollout_batch: int | None = None,
    noise: InjectedNoise | None = None,
    fresh_expansion: bool = False,
) -> MCTSResult:
    tree, noise_tab = mcts_init(
        backend, z, key, params, rollout_batch=rollout_batch, noise=noise
    )

    def timestep_body(tree: _Tree, i: jax.Array) -> tuple[_Tree, None]:
        return mcts_timestep(
            backend, tree, noise_tab, key, i, params, rollout_batch=rollout_batch,
            fresh_expansion=fresh_expansion,
        ), None

    tree, _ = jax.lax.scan(
        timestep_body, tree, jnp.arange(backend.num_steps, dtype=jnp.int32)
    )
    return mcts_result(tree)


__all__ = ["mcts_search", "mcts_init", "mcts_timestep", "mcts_result", "MCTSResult"]
