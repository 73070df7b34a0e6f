"""Config tree + typed-JSON compat loader tests (reference util/config.py)."""

import json

import pytest

from vlsfr_tpu.config import Config, convert_param, load_typed_json


def test_defaults_match_reference_cli():
    """Defaults mirror reference main.py:151-163 + config/optim_config."""
    c = Config()
    assert c.model.net_type == "r50"
    assert c.model.feat_dim == 512
    assert c.pool.queue_size == 1000
    assert c.pool.momentum == 0.99
    assert c.loss.loss_type == "Arc"
    assert c.loss.margin == 0.5
    assert c.loss.scale == 32.0
    assert c.loss.neg_margin == 0.25
    assert c.data.batch_size == 64
    assert c.optim.optim == "SGD"
    assert c.optim.lr == 0.1
    assert c.optim.milestones == [8, 14, 17]


def test_roundtrip(tmp_path):
    c = Config()
    c.pool.queue_size = 12345
    c.optim.milestones = [1, 2]
    p = tmp_path / "cfg.json"
    c.save(str(p))
    c2 = Config.load(str(p))
    assert c2.pool.queue_size == 12345
    assert c2.optim.milestones == [1, 2]
    assert c2.to_dict() == c.to_dict()


def test_overrides():
    c = Config()
    c.apply_overrides(
        ["pool.queue_size=99", "loss.margin=0.3", "optim.nesterov=false", "optim.milestones=[2,4]"]
    )
    assert c.pool.queue_size == 99
    assert c.loss.margin == 0.3
    assert c.optim.nesterov is False
    assert c.optim.milestones == [2, 4]
    with pytest.raises(ValueError):
        c.apply_overrides(["nope.key=1"])
    with pytest.raises(ValueError):
        c.apply_overrides(["pool.bogus=1"])


def test_convert_param_semantics():
    assert convert_param(["int", 3]) == 3
    assert convert_param(["float", "0.5"]) == 0.5
    assert convert_param(["bool", "True"]) is True
    assert convert_param(["bool", "False"]) is False
    assert convert_param(["int", [8, 14, 17]]) == [8, 14, 17]
    assert convert_param(["none", "x"]) is None
    with pytest.raises(ValueError):
        convert_param(["enum", 1])


def test_reference_optim_config_compat(tmp_path):
    """Load a file in the exact reference format (config/optim_config:1-14)."""
    raw = {
        "optim": ["str", "SGD"],
        "scheduler": ["str", "multistep"],
        "epochs": ["int", 1],
        "warmup": ["int", 0],
        "milestones": ["int", [8, 14, 17]],
        "gammas": ["float", [0.1, 0.1, 0.1]],
        "LR": ["float", 0.1],
        "decay": ["float", 0.0001],
        "momentum": ["float", 0.9],
        "nesterov": ["bool", "True"],
    }
    p = tmp_path / "optim_config"
    p.write_text(json.dumps(raw))
    assert load_typed_json(str(p))["LR"] == 0.1
    c = Config()
    c.apply_reference_optim_config(str(p))
    assert c.optim.epochs == 1
    assert c.optim.warmup_epochs == 0
    assert c.optim.weight_decay == 0.0001
    assert c.optim.nesterov is True
    assert c.optim.gammas == [0.1, 0.1, 0.1]


def test_shipped_configs_load():
    """Every configs/*.json parses through Config.load; the 10M config
    encodes BASELINE config 5 (10.5M int8 pool + int8 compute, size
    1024-divisible so the fused head keeps its wide stream tile)."""
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.json")))
    assert paths
    cfgs = {os.path.basename(p): Config.load(p) for p in paths
            if os.path.basename(p) != "reference_optim.json"}
    ten = cfgs["ffc_10m_ids.json"]
    assert ten.pool.queue_size == 10485760
    assert ten.pool.queue_size % 1024 == 0
    assert ten.pool.queue_dtype == "int8"
    assert ten.pool.queue_int8_compute is True
    assert ten.pool.fuse_forward is True
