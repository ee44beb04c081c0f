"""On-chip eval-path timing (VERDICT r2 #9): measure tools/test.py's
pipelined eval loop at flagship VoD scale on synthetic data and report
ms/frame vs the chained bench figure.

Round-1 datum: the synchronous per-frame eval loop measured 357.5 ms/frame
against the 110 ms chained bench — per-frame H2D/D2H sync through the
tunnel dominated. tools/test.py now runs a producer-thread + async-dispatch
pipeline (batch i+1 H2D and device step overlap batch i's host postprocess);
this script quantifies what that recovers through the official eval path.

Run on the chip (the runbook queues it): python _bench_eval_path.py
Emits one JSON line per (config, batch) with eval-loop ms/frame parsed from
the tools/test.py log, plus the AP-path wall time for context.
"""
import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

FRAMES = int(os.environ.get("HGS_EVAL_BENCH_FRAMES", "32"))


def main():
    from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti

    root = Path(tempfile.mkdtemp(prefix="hgs_eval_bench_"))
    data = root / "data"
    make_synthetic_kitti(data, num_frames=FRAMES, num_points=4096,
                         num_virtual=256, image_hw=(516, 1936))
    subprocess.run(
        [sys.executable, "tools/create_infos.py",
         "--cfg_file", "configs/hgsfusion_vod.yaml",
         "--set", "DATA_CONFIG.DATA_PATH", str(data),
         "DATA_CONFIG.VIRTUAL_POINT_PREFIX", "virtual_points"],
        check=True, capture_output=True, text=True)

    runs = [
        # polar view (round 4): the serving default. The per-BATCH D2H
        # fetch through the dev tunnel (~180 ms latency) dominates the
        # pipelined loop at B=1, so the batch scan measures how far the
        # official eval path amortizes it.
        ("configs/hgsfusion_vod_polar.yaml", 1, "eval_path_vod_polar_b1"),
        ("configs/hgsfusion_vod_polar.yaml", 2, "eval_path_vod_polar_b2"),
        ("configs/hgsfusion_vod_polar.yaml", 4, "eval_path_vod_polar_b4"),
    ]
    for cfg, bs, tag in runs:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "tools/test.py", "--cfg_file", cfg,
             "--batch_size", str(bs), "--infer_time",
             "--max_frames", str(FRAMES),
             "--output_dir", str(root / "out"), "--extra_tag", tag,
             "--set", "DATA_CONFIG.DATA_PATH", str(data),
             "DATA_CONFIG.VIRTUAL_POINT_PREFIX", "virtual_points"],
            capture_output=True, text=True)
        wall = time.time() - t0
        log = r.stdout + r.stderr
        m = re.search(r"inference \(pipelined\):\s*([0-9.]+) ms/frame", log)
        if r.returncode != 0 or not m:
            print(json.dumps({"metric": tag, "error": "run-failed",
                              "rc": r.returncode, "tail": log[-800:]}))
            continue
        ms = float(m.group(1))
        print(json.dumps({
            "metric": tag, "value": round(1000.0 / ms, 2), "unit": "fps",
            "ms_per_frame": ms, "wall_s": round(wall, 1),
            "note": "official eval path, pipelined loop, synthetic "
                    f"flagship-scale data ({FRAMES} frames)"}))


if __name__ == "__main__":
    main()
