"""Config-parser semantics tests (the override engine must behave verbatim
like the reference: dotted keys, [i] list indexing, type coercion, group
preset swap with CLI-override precedence)."""

import sys

import pytest

from nps_tpu.configs.parse import parse_args


CFG = "nps_tpu/configs/train/cfg_twophase_ufno.py"


def run_parser(argv):
    old = sys.argv
    try:
        sys.argv = ["prog", "-C", CFG] + argv
        return parse_args()
    finally:
        sys.argv = old


def test_defaults_roundtrip():
    args = run_parser([])
    assert args["seed"] == 42
    assert args["time_window"] == 25
    assert args["dataset"]["object"] == "PDE2DDataset"
    assert args["dataset"]["c_filter"] == [6]
    assert args["model"]["processor"] == "UFNO"
    assert args["model"]["hidden_features"] == 192
    assert args["model"]["fno_modes"] == 10
    assert args["trainer"]["num_epochs"] == 500
    assert args["trainer"]["unrolling"] == 8
    assert args["optimizer"]["lr"] == 1e-4
    assert args["lr_scheduler"]["milestones"] == [1, 5, 10, 15]
    assert args["criterion"]["reduction"] == "sum"
    assert args["trainer"]["print_setting"]["print_per_step"] is True


def test_dotted_override_and_type_coercion():
    args = run_parser(["--trainer.num_epochs=7",
                       "--model.hidden_features=64",
                       "--optimizer.lr=0.01",
                       "--trainer.print_setting.print_per_step=false",
                       "--model.ch_mults=[1,2,4]"])
    assert args["trainer"]["num_epochs"] == 7
    assert isinstance(args["trainer"]["num_epochs"], int)
    assert args["model"]["hidden_features"] == 64
    assert args["optimizer"]["lr"] == 0.01
    assert args["trainer"]["print_setting"]["print_per_step"] is False
    assert args["model"]["ch_mults"] == [1, 2, 4]


def test_group_preset_swap_with_cli_override():
    # swap the whole optimizer group from defaults, then override a key
    args = run_parser(["--optimizer=Adam", "--optimizer.lr=0.5"])
    assert args["optimizer"]["object"] == "optim.Adam"
    assert args["optimizer"]["lr"] == 0.5


def test_group_preset_swap_suppresses_config_values():
    args = run_parser(["--criterion=MSE_sum"])
    assert args["criterion"] == dict(object="nn.MSELoss", reduction="sum")


def test_list_indexed_override():
    cfg = "nps_tpu/configs/train/cfg_twophase_ufno_fno.py"
    old = sys.argv
    try:
        sys.argv = ["prog", "-C", cfg, "--model.processor[1].object=FNO"]
        args = parse_args()
    finally:
        sys.argv = old
    assert args["model"]["processor"] == [dict(object="FNO"),
                                          dict(object="FNO")]


def test_seed_flag():
    args = run_parser(["--seed=7"])
    assert args["seed"] == 7


def test_missing_config_raises():
    old = sys.argv
    try:
        sys.argv = ["prog", "-C", "configs/not/a/config.py"]
        with pytest.raises(Exception, match="parser"):
            parse_args()
    finally:
        sys.argv = old


def test_ns512_stretch_config():
    old = sys.argv
    try:
        sys.argv = ["prog", "-C", "nps_tpu/configs/train/cfg_ns512_ufno.py"]
        args = parse_args()
    finally:
        sys.argv = old
    assert args["trainer"]["base_resolution"] == (101, 512, 512)
    assert args["trainer"]["data_parallel"] is True
    assert args["trainer"]["compute_dtype"] == "bfloat16"
    assert args["model"]["fno_modes"] == 20
    assert args["model"]["remat"] is True


def test_activation_object_string_override():
    # rich config values opt into CLI string overrides via _parse_override
    # (the reference parser cannot override activation objects at all);
    # --model.activation=gelu_tanh is the documented TPU-production switch
    from nps_tpu.models.activations import GELU, GELUTanh

    args = run_parser([])
    assert isinstance(args["model"]["activation"], GELU)
    args = run_parser(["--model.activation=gelu_tanh"])
    assert isinstance(args["model"]["activation"], GELUTanh)
    with pytest.raises(SystemExit):  # unknown name -> argparse type error
        run_parser(["--model.activation=gelu_typo"])
