"""Pipelined eval loop (tools/test.py run_eval): the producer-thread +
async-dispatch pipeline must be a pure reorganization — per-frame results
identical to frame-at-a-time evaluation, order preserved, regardless of
batch size (5 frames at B=2 exercises the ragged final batch)."""
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    import subprocess

    import yaml

    from test_cli import _write_cfg

    from hgsfusion_tpu.config import load_config, model_config_from_yaml
    from hgsfusion_tpu.datasets import build_dataset
    from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti
    from hgsfusion_tpu.models.registry import build_network
    from hgsfusion_tpu.train.trainer import add_init_anchors, device_batch
    from hgsfusion_tpu.utils.common import create_logger

    tmp = tmp_path_factory.mktemp("eval_pipeline")
    data_root = tmp / "data"
    make_synthetic_kitti(data_root, num_frames=5, num_points=256,
                         num_virtual=32)
    cfg_path = tmp / "tiny.yaml"
    _write_cfg(cfg_path, data_root)
    r = subprocess.run(
        [sys.executable, "tools/create_infos.py", "--cfg_file",
         str(cfg_path)], cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    cfg = load_config(cfg_path)
    model_cfg = model_config_from_yaml(cfg)
    logger = create_logger()
    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                            training=False, logger=logger)
    model = build_network(cfg, model_cfg)
    import jax.numpy as jnp

    batch = dataset.collate_batch([dataset[0]])
    init_inputs = add_init_anchors(
        {k: jnp.asarray(v) for k, v in device_batch(batch).items()},
        cfg, model_cfg)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, False))(init_inputs)
    return (cfg, model_cfg, dataset, variables["params"],
            variables["batch_stats"], logger)


def _annos(eval_setup, batch_size):
    from test import run_eval

    cfg, model_cfg, dataset, params, stats, logger = eval_setup
    det_annos, _ = run_eval(cfg, model_cfg, dataset, params, stats, logger,
                            batch_size=batch_size)
    return det_annos


class TestPipelinedEvalInvariance:
    def test_batch_size_invariant_and_order_preserving(self, eval_setup):
        a1 = _annos(eval_setup, 1)
        a2 = _annos(eval_setup, 2)  # 5 frames -> batches of 2, 2, 1
        assert len(a1) == len(a2) == 5
        for f1, f2 in zip(a1, a2):
            assert f1["frame_id"] == f2["frame_id"]
            assert list(f1["name"]) == list(f2["name"])
            for key in ("location", "dimensions", "rotation_y", "score",
                        "bbox"):
                np.testing.assert_allclose(
                    np.asarray(f1[key], np.float64),
                    np.asarray(f2[key], np.float64),
                    rtol=1e-4, atol=1e-4, err_msg=key)

    def test_producer_exception_surfaces(self, eval_setup, monkeypatch):
        from test import run_eval

        cfg, model_cfg, dataset, params, stats, logger = eval_setup

        class Boom(RuntimeError):
            pass

        def bad_collate(samples):
            raise Boom("collate failed in producer thread")

        monkeypatch.setattr(dataset, "collate_batch", bad_collate)
        with pytest.raises(Boom):
            run_eval(cfg, model_cfg, dataset, params, stats, logger,
                     batch_size=2)
