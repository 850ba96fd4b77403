import argparse

import pytest

from mapf_gpt_tpu.utils.configurator import apply_config


def _ns(**kw):
    return argparse.Namespace(**kw)


def test_config_file_and_overrides(tmp_path):
    cfg = tmp_path / "c.py"
    cfg.write_text("batch_size = 128\nmodel = '6M'\nignored_helper = len\n")
    ns = _ns(batch_size=64, model="2M", lr=1e-3)
    apply_config(ns, str(cfg), ["--lr=5e-4"])
    assert ns.batch_size == 128 and ns.model == "6M" and ns.lr == 5e-4


def test_unknown_key_rejected():
    with pytest.raises(ValueError):
        apply_config(_ns(a=1), None, ["--nope=2"])


def test_type_mismatch_rejected(tmp_path):
    cfg = tmp_path / "c.py"
    cfg.write_text("a = 'oops'\n")
    with pytest.raises(TypeError):
        apply_config(_ns(a=1), str(cfg))


def test_string_override_passthrough():
    ns = _ns(name="x")
    apply_config(ns, None, ["--name=hello"])
    assert ns.name == "hello"
