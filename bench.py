"""End-to-end inference benchmark on the real TPU chip.

Measures frames/sec of the full HGSFusion VoD pipeline — image backbone,
frustum view transform, radar pillar branch, DSM fusion, anchor head, box
decode, and rotated NMS — all inside one jitted graph (nothing leaves the
device until the final fixed-shape detections).

Baseline note: the reference repo publishes no FPS numbers (BASELINE.md).
The target from BASELINE.json is >=3x the reference's A100 end-to-end FPS on
one v5e chip. No GPU exists in this environment, so the denominator is a
per-stage roofline estimate of the reference forward on A100 (fp32 with
cudnn TF32, eager PyTorch, B=1), built in BASELINE.md "Reference A100
roofline": dilated DeepLabV3-ResNet101 backbone 670 GMACs ~= 18 ms, frustum
grid gen + 4x 5-D grid_sample + concat + Conv3d reduce ~= 20 ms of mostly
HBM traffic, radar branch ~= 4 ms, DSM + head ~= 4.5 ms, NMS (GPU bitmask +
D2H + CPU sweep) ~= 3 ms, eager dispatch + H2D ~= 6 ms => ~56 ms/frame,
REF_A100_FPS = 18 (defended range 13-26). vs_baseline = fps /
(3 * REF_A100_FPS), so 1.0 == target met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

REF_A100_FPS = 18.0  # roofline estimate; see BASELINE.md "Reference A100 roofline"
TARGET_MULTIPLIER = 3.0


def probe_backend(timeout_s: int | None = None):
    """Bound JAX backend init AND a fresh-shape compile so a sick TPU
    tunnel yields a readable diagnostic instead of a hang + 30-line
    traceback. Two observed failure modes: (round 2) the tunnel is fully
    dead and jax.devices() itself hangs; (round 5) the remote COMPILE
    service is dead while cached executables still run, so devices() and
    fixed-shape probes succeed but any new graph wedges forever — hence
    the probe compiles a deliberately odd, run-specific shape. The hang
    happens inside a blocking C (grpc) call, so SIGALRM never delivers
    in-process — the probe must be a killable child process. Raises
    TimeoutError on hang, RuntimeError on backend-init error.
    """
    import os
    import subprocess
    import sys
    import time

    if timeout_s is None:
        timeout_s = int(os.environ.get("HGS_BENCH_PROBE_TIMEOUT", "240"))
    if timeout_s <= 0:
        raise TimeoutError("jax backend init exceeded 0s")
    n = 251 + int(time.time()) % 199  # fresh shape each run: defeat caches
    try:
        res = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp\n"
             "jax.devices()\n"
             f"x = jnp.ones(({n}, {n + 3}))\n"
             "float((x @ x.T).sum())"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        raise TimeoutError(
            f"jax backend init / fresh-shape compile exceeded {timeout_s}s")
    if res.returncode != 0:
        tail = (res.stderr.strip().splitlines() or ["backend init failed"])[-1]
        raise RuntimeError(tail)


def _calibrate_realistic(model, variables, batch, target: int = 64):
    """Shift the cls-head bias so ~`target` candidates per frame clear the
    0.1 score threshold — the trained-model regime.

    The default bench runs RANDOM weights, whose near-uniform sigmoid
    scores keep all 4096 pre-NMS candidates alive and drive the lazy NMS
    while_loop through all 500 iterations — a worst case for the post
    stage while the chained device-resident batches are a best case for
    everything else. A flagship model trained on the round-5 structured
    study data keeps ~8 post-NMS boxes/frame at the shipped thresholds
    (BASELINE.md round-5 study); with NMS_THRESH 0.01 suppressing ~8
    near-duplicate anchors per kept box, ~64 above-threshold pre-NMS
    candidates is the representative load. One forward measures the
    logit distribution; one global bias shift puts the `target`-th
    largest logit exactly at logit(0.1). Shapes are unchanged — only the
    score CONTENT moves, so this isolates the data-dependent NMS cost.
    """
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    preds = jax.jit(lambda v, b: model.apply(v, b, False))(variables, batch)
    logits = np.asarray(
        preds["cls_preds"].astype(jnp.float32)
    ).reshape(batch["images"].shape[0], -1)
    rank_val = float(np.median(np.sort(logits, axis=1)[:, -target]))
    thr_logit = float(np.log(0.1 / 0.9))  # sigmoid^-1(0.1)
    delta = thr_logit - rank_val
    variables = copy.deepcopy(jax.device_get(variables))
    bias = variables["params"]["dense_head"]["conv_cls"]["bias"]
    variables["params"]["dense_head"]["conv_cls"]["bias"] = bias + delta
    return jax.device_put(variables)


def main(dataset: str = "vod", batch_size: int = 1, realistic: bool = False):
    """dataset: 'vod' (driver default) or 'tj4d' (python bench.py --tj4d —
    the second headline config: 216x248 grid, 4 classes, 31-wide reader).
    batch_size: --batch N (XLA-sampler B=2 OOMs on v5e — 18.3G frustum
    intermediates vs 15.75G HBM; the VMEM-resident pallas sampler variant
    removes those buffers, so B=2 is worth measuring there).
    realistic: --realistic shifts scores to the trained-model regime (see
    _calibrate_realistic) instead of the default all-candidates worst
    case; both lines are reported in BASELINE.md."""
    import jax

    from __graft_entry__ import _vod_flagship
    from hgsfusion_tpu.models.anchors import TargetAssigner
    from hgsfusion_tpu.config import load_config
    from hgsfusion_tpu.models.detector import post_process

    config_path = f"configs/hgsfusion_{dataset}.yaml"
    model, cfg, batch = _vod_flagship(config_path=config_path, b=batch_size)
    yaml_cfg = load_config(config_path)
    anchor_cfg = [dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG]
    assigner = TargetAssigner(
        anchor_cfg, cfg.grid_size, cfg.pc_range, class_names=cfg.class_names
    )
    post_cfg = yaml_cfg.MODEL.POST_PROCESSING

    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)
    if realistic:
        variables = _calibrate_realistic(model, variables, batch)

    @jax.jit
    def infer(variables, batch):
        preds = model.apply(variables, batch, False)
        return post_process(
            preds, assigner.flat_anchors, assigner.box_coder, cfg,
            score_thresh=post_cfg.SCORE_THRESH,
            nms_thresh=post_cfg.NMS_CONFIG.NMS_THRESH,
            pre_max_size=post_cfg.NMS_CONFIG.NMS_PRE_MAXSIZE,
            post_max_size=post_cfg.NMS_CONFIG.NMS_POST_MAXSIZE,
        )

    import jax.numpy as jnp

    # warmup / compile; fetch a scalar to force true completion (through the
    # remote runtime, block_until_ready alone can return before execution)
    out = infer(variables, batch)
    _ = float(jnp.sum(out["scores"]))

    # Chain iterations with ONE final scalar fetch: the dev tunnel's
    # device->host latency is ~180 ms and would otherwise dominate; chained
    # execution serializes on-chip so wall/iters is the true per-frame time.
    # Median of three chains: the dev chip is shared, so a single chain can
    # catch another tenant's burst (~5-15% swings between runs).
    iters = 20
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, batch)
        _ = float(jnp.sum(out["scores"]))
        dt = time.perf_counter() - t0
        rates.append(iters * batch["images"].shape[0] / dt)
    fps = sorted(rates)[1]

    tag = "" if batch_size == 1 else f"_b{batch_size}"
    if realistic:
        import sys

        tag += "_realistic"
        kept = int(jnp.sum(out["valid"])) if "valid" in out else -1
        print(f"# realistic regime: {kept} post-NMS boxes in the last "
              f"batch of {batch_size}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"hgsfusion_{dataset}{tag}_e2e_inference",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / (TARGET_MULTIPLIER * REF_A100_FPS), 4),
            }
        )
    )


if __name__ == "__main__":
    import sys

    # --tj4d (second headline config) or --<any> -> configs/hgsfusion_<any>.yaml
    # (e.g. --vod_pallas for the Pallas f2v sampler variant);
    # --batch N for batched serving measurements
    args = sys.argv[1:]
    bsz = 1
    realistic = False
    rest = []
    skip = False
    for i, a in enumerate(args):
        if skip:
            skip = False
            continue
        if a == "--batch":
            if i + 1 >= len(args):
                raise SystemExit("--batch requires a value (e.g. --batch 2)")
            bsz = int(args[i + 1])
            skip = True
        elif a.startswith("--batch="):
            bsz = int(a.split("=", 1)[1])
        elif a == "--realistic":
            realistic = True
        else:
            rest.append(a)
    arg = next((a.lstrip("-") for a in rest if a.startswith("--")), None)
    # default = the polar-view serving config (models/polar_f2v.py): the
    # shipped flagship pipeline with the view transform's polar
    # factorization (checkpoint-compatible with the exact gather path;
    # approximation bounds in tests/test_polar_f2v.py). `--vod` runs the
    # exact-transform config.
    dataset = arg or "vod_polar"
    try:
        probe_backend()
        main(dataset, batch_size=bsz, realistic=realistic)
    except BaseException as e:  # noqa: BLE001 — one legible line, always
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        reason = "tpu-unavailable" if isinstance(e, TimeoutError) else type(e).__name__
        first_line = str(e).strip().splitlines()[0] if str(e).strip() else ""
        tag = "" if bsz == 1 else f"_b{bsz}"
        if realistic:
            tag += "_realistic"
        print(
            json.dumps(
                {
                    "metric": f"hgsfusion_{dataset}{tag}_e2e_inference",
                    "value": 0.0,
                    "unit": "frames/sec/chip",
                    "vs_baseline": 0.0,
                    "error": reason,
                    "detail": first_line[:200],
                }
            )
        )
        raise SystemExit(1)
