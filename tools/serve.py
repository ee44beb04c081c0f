"""Minimal serving host: drive a StableHLO artifact with no model code.

The deployment counterpart of tools/export.py (a surface the torch
reference has no equivalent of): loads the serialized inference graph
(forward + decode + NMS with the checkpoint baked in), feeds it batches
from .npz files — one array per saved key, shapes must match the
artifact's pinned static shapes — and writes fixed-shape detection
arrays back as .npz. No config parsing, checkpoint restore, or
hgsfusion_tpu model imports happen on this path.

Usage:
  python tools/serve.py --artifact model.stablehlo --inputs batches/ \
      --out_dir detections/ [--warmup 2] [--time]
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path


def load_artifact(path):
    from jax import export as jexport

    return jexport.deserialize(Path(path).read_bytes())


def main():
    import jax
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True, help=".stablehlo file")
    p.add_argument("--inputs", required=True,
                   help="directory of .npz batch files (or one .npz)")
    p.add_argument("--out_dir", default="detections")
    p.add_argument("--warmup", type=int, default=1,
                   help="extra calls on the first batch before timing")
    p.add_argument("--time", action="store_true",
                   help="print per-batch latency (device-fetch bracketed)")
    args = p.parse_args()

    exported = load_artifact(args.artifact)
    print(f"loaded {args.artifact}: platforms {exported.platforms}")

    inputs = Path(args.inputs)
    files = sorted(inputs.glob("*.npz")) if inputs.is_dir() else [inputs]
    if not files:
        raise SystemExit(f"no .npz batches under {inputs}")
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def call(batch):
        return exported.call({k: batch[k] for k in batch.files})

    first = np.load(files[0])
    for _ in range(max(args.warmup, 0)):
        jax.block_until_ready(call(first))

    # double-buffered: batch i+1 is dispatched (async) before batch i's
    # results are fetched, so H2D/compute overlap the host-side fetch+save
    # — same structure as the pipelined eval loop (tools/test.py run_eval)
    def finish(item):
        f, dets, t0 = item
        dets = {k: np.asarray(v) for k, v in dets.items()}  # sync point
        dt = time.perf_counter() - t0
        out = out_dir / f"{f.stem}_dets.npz"
        np.savez(out, **dets)
        msg = f"{f.name} -> {out.name}"
        if args.time:
            msg += f"  {dt * 1e3:.1f} ms"
        print(msg)

    pending = None
    for f in files:
        batch = np.load(f)
        t0 = time.perf_counter()
        dets = call(batch)  # async dispatch
        if pending is not None:
            finish(pending)
        pending = (f, dets, t0)
    if pending is not None:
        finish(pending)


if __name__ == "__main__":
    main()
