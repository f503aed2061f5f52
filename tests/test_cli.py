"""CLI grammar tests (ref grammar: scripts/train.py:2-30, README.md:38-45)."""
import pytest

from soccernerfs_tpu.configs.cli import parse_train_cli


def test_method_and_nested_flags():
    cfg = parse_train_cli(
        [
            "k-planes",
            "--max-num-iterations", "123",
            "--pipeline.model.multiscale-res", "1", "2", "4",
            "--pipeline.datamanager.ist-range", "0.75",
            "broadcaststyle-data",
            "--fps-downsample", "4",
            "--data", "/tmp/x",
        ]
    )
    assert cfg.max_num_iterations == 123
    assert cfg.pipeline.model.multiscale_res == (1, 2, 4)
    assert cfg.pipeline.datamanager.ist_range == 0.75
    dp = cfg.pipeline.datamanager.dataparser
    assert type(dp).__name__ == "BroadcaststyleDataParserConfig"
    assert dp.fps_downsample == 4.0
    assert str(dp.data) == "/tmp/x"


def test_data_alias_before_dataparser():
    cfg = parse_train_cli(["k-planes", "--data", "/tmp/y", "stadium-data"])
    assert str(cfg.pipeline.datamanager.dataparser.data) == "/tmp/y"


def test_loss_coefficient_dict_key():
    cfg = parse_train_cli(
        ["k-planes", "--pipeline.model.loss-coefficients.space-tv-loss", "0.2"]
    )
    assert cfg.pipeline.model.loss_coef["space_tv_loss"] == 0.2


def test_unknown_method_and_flag():
    with pytest.raises(SystemExit):
        parse_train_cli(["not-a-method"])
    with pytest.raises(SystemExit):
        parse_train_cli(["k-planes", "--no.such.flag", "1"])


def test_frozen_model_config_replace():
    cfg = parse_train_cli(
        ["nerfacto", "--pipeline.model.num-nerf-samples-per-ray", "12"]
    )
    assert cfg.pipeline.model.num_nerf_samples_per_ray == 12
