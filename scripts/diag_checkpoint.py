#!/usr/bin/env python
"""Post-mortem of a training checkpoint: param distributions, culling
breakdown, and per-time render probes. Usage:
  python scripts/diag_checkpoint.py <chkpnt.npz> [--cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["FOURDGS_PLATFORM"] = "cpu"

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.train import checkpoint
    from fourdgs_tpu.train.config import Config

    path = sys.argv[1]
    import json
    cfg_path = os.path.join(os.path.dirname(path), "cfg_args.json")
    raw = np.load(path, allow_pickle=True)
    print("keys:", sorted(raw.files)[:8], "...")
    meta = json.loads(str(raw["meta"])) if "meta" in raw.files else {}
    print("meta:", meta)

    # pull raw arrays without rebuilding the full TrainState
    def arr(name):
        for k in raw.files:
            if k.endswith(name):
                return np.asarray(raw[k])
        return None

    alive = arr("alive")
    for field in ("xyz", "scaling", "rotation", "opacity"):
        a = None
        for k in raw.files:
            if f"gauss.{field}" in k or k == f"params/gauss/{field}":
                a = np.asarray(raw[k])
        if a is None:
            # search loosely
            cands = [k for k in raw.files if field in k and "mu" not in k
                     and "nu" not in k]
            print(f"{field}: candidates {cands[:4]}")
            if cands:
                a = np.asarray(raw[cands[0]])
        if a is None:
            continue
        al = a[alive.astype(bool)] if alive is not None and \
            alive.shape[0] == a.shape[0] else a
        print(f"{field:10s} shape {a.shape} alive-stats: "
              f"min {al.min():.4g} max {al.max():.4g} "
              f"absmax {np.abs(al).max():.4g} "
              f"nan {np.isnan(al).sum()} inf {np.isinf(al).sum()}")
    if alive is not None:
        print("alive:", int(alive.sum()), "/", alive.shape[0])


if __name__ == "__main__":
    main()
