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
    # — same structure as the pipelined eval loop (tools/test.py run_eval).
    # Timing: inter-completion gaps, not dispatch-to-fetch spans — in a
    # pipeline the spans of consecutive batches overlap (batch i's fetch
    # happens after batch i+1's np.load + dispatch), so a span would bill
    # the next file's disk IO to this file; completion gaps tile the wall
    # clock exactly and their mean is the pipelined per-batch latency.
    last_done = None

    def finish(item):
        nonlocal last_done
        f, dets = item
        dets = {k: np.asarray(v) for k, v in dets.items()}  # sync point
        now = time.perf_counter()
        out = out_dir / f"{f.stem}_dets.npz"
        np.savez(out, **dets)
        msg = f"{f.name} -> {out.name}"
        if args.time and last_done is not None:
            msg += f"  {(now - last_done) * 1e3:.1f} ms"
        last_done = now
        print(msg)

    pending = None
    for f in files:
        batch = np.load(f)
        dets = call(batch)  # async dispatch
        if pending is not None:
            finish(pending)
        pending = (f, dets)
    if pending is not None:
        finish(pending)


if __name__ == "__main__":
    main()
