"""Export an NVIDIA EDM source-pickled .pkl checkpoint to a plain .npz.

The reference's checkpoints are torch modules pickled with embedded source
(edm/torch_utils/persistence.py); loading them requires torch once, on the
host. This tool runs that unpickle (needs /root/reference/edm on sys.path
for the persistence machinery) and writes {torch_name: float32 ndarray} to
.npz for models/torch_import.convert_state_dict.

Usage: python tools/export_edm_checkpoint.py <in.pkl> <out.npz>
"""
from __future__ import annotations

import pickle
import sys


def main(src: str, dst: str):
    sys.path.insert(0, "/root/reference/edm")
    import numpy as np

    with open(src, "rb") as f:
        data = pickle.load(f)
    net = data["ema"] if isinstance(data, dict) and "ema" in data else data
    state = {k: v.detach().cpu().numpy().astype(np.float32)
             for k, v in net.state_dict().items()}
    # the inner model is under 'model.'; keep the full precond-prefixed names
    np.savez_compressed(dst, **state)
    print(f"exported {len(state)} tensors -> {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
