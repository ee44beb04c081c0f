"""Every shipped config must parse, resolve its model config, and build.

Guards against config-schema / registry drift: the reference's configs
are the user-facing API surface (tools/cfgs/*), so a yaml that stops
building is a breaking change even when no test exercises that family
end-to-end.
"""
from pathlib import Path

import pytest

CONFIGS = sorted(Path("/root/repo/configs").glob("*.yaml"))


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=lambda p: p.stem)
def test_config_builds(cfg_path):
    from hgsfusion_tpu.config import load_config, model_config_from_yaml
    from hgsfusion_tpu.models.registry import DETECTORS, build_network

    cfg = load_config(str(cfg_path))
    assert cfg.MODEL.NAME in DETECTORS, cfg.MODEL.NAME
    assert cfg.CLASS_NAMES
    model_cfg = model_config_from_yaml(cfg)
    assert model_cfg.grid_size[0] > 0
    model = build_network(cfg, model_cfg)
    assert model is not None


def test_all_configs_enumerated():
    assert len(CONFIGS) >= 16, [p.name for p in CONFIGS]


def test_headless_config_builds():
    """Head-less / fusion-less configs (MPPNet-style user yamls) resolve
    through the dataclass defaults instead of crashing on missing blocks
    (the reference ships no MPPNet config either; this keeps the schema
    open for user-authored ones — docs/guidelines_of_approaches/mppnet.md)."""
    from hgsfusion_tpu.config import ConfigDict, model_config_from_yaml
    from hgsfusion_tpu.models.registry import build_network

    cfg = ConfigDict({
        "CLASS_NAMES": ["Vehicle", "Pedestrian", "Cyclist"],
        "DATA_CONFIG": {
            "POINT_CLOUD_RANGE": [-75.2, -75.2, -5.0, 75.2, 75.2, 3.0],
            "POINT_FEATURE_ENCODING": {
                "used_feature_list": ["x", "y", "z", "intensity", "time"]},
            "DATA_PROCESSOR": [
                {"NAME": "calculate_grid_size",
                 "VOXEL_SIZE": [0.1, 0.1, 0.15]}],
        },
        "MODEL": {"NAME": "MPPNet", "POST_PROCESSING": {}},
    })
    model_cfg = model_config_from_yaml(cfg)
    assert model_cfg.num_point_features == 5
    net = build_network(cfg, model_cfg)
    assert type(net).__name__ == "MPPNetModel"
