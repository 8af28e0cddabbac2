import os

from aot_tpu.configs import MODEL_REGISTRY, build_config


def test_model_registry_complete():
    # all 14 named variants from the reference model zoo + 2 defaults
    expected = {
        "aott", "aots", "aotb", "aotl",
        "r50_aotl", "r101_aotl", "rs101_aotl", "swinb_aotl",
        "deaott", "deaots", "deaotb", "deaotl",
        "r50_deaotl", "swinb_deaotl",
        "default", "default_deaot",
    }
    assert expected <= set(MODEL_REGISTRY)


def test_aotl_hyperparams():
    cfg = build_config(stage="pre_ytb_dav", model="aotl", exp_name="t")
    assert cfg.MODEL_LSTT_NUM == 3
    assert cfg.TRAIN_LONG_TERM_MEM_GAP == 2
    assert cfg.TEST_LONG_TERM_MEM_GAP == 5
    assert cfg.STAGE_NAME == "PRE_YTB_DAV"
    assert cfg.DATASETS == ["youtubevos", "davis2017"]
    assert cfg.PRETRAIN_FULL is True
    assert cfg.EXP_NAME == "t_AOTL"


def test_deaot_defaults():
    cfg = build_config(stage="pre", model="deaott")
    assert cfg.MODEL_VOS == "deaot"
    assert cfg.MODEL_SELF_HEADS == 1 and cfg.MODEL_ATT_HEADS == 1
    assert cfg.MODEL_DECODER_INTERMEDIATE_LSTT is False
    assert cfg.TRAIN_AUG_TYPE == "v2"
    # PRE stage overrides (reference: configs/pre.py)
    assert cfg.DATA_DYNAMIC_MERGE_PROB == 1.0
    assert cfg.TRAIN_LR == 4e-4
    assert cfg.TRAIN_AUX_LOSS_RATIO == 0.1


def test_swin_align_corners_crop():
    cfg = build_config(stage="ytb", model="swinb_aotl")
    assert cfg.MODEL_ALIGN_CORNERS is False
    assert tuple(cfg.DATA_RANDOMCROP) == (464, 464)


def test_cli_overrides_win():
    cfg = build_config(stage="pre", model="aott", TRAIN_LR=1e-3, TRAIN_BATCH_SIZE=4)
    assert cfg.TRAIN_LR == 1e-3
    assert cfg.TRAIN_BATCH_SIZE == 4


def test_stage_chain_points_at_ema_dir():
    """PRE_YTB_DAV seeds from PRE's EMA checkpoints; the config points at
    the ema_ckpt DIRECTORY (the trainer resolves to the newest file), so
    chains work for any PRE total-step count — the reference hardcodes
    save_step_100000.pth and breaks for shorter runs."""
    import os

    from aot_tpu.configs import build_config

    cfg = build_config(stage="pre_ytb_dav", model="aott", exp_name="chainx")
    assert cfg.PRETRAIN_FULL
    assert os.path.basename(cfg.PRETRAIN_MODEL) == "ema_ckpt"
    assert os.path.join("chainx_AOTT", "PRE", "ema_ckpt") in cfg.PRETRAIN_MODEL


def test_dir_overrides_survive_init_dir():
    """Explicit DIR_* overrides must not be clobbered by init_dir's
    DIR_DATA derivation."""
    cfg = build_config(stage="pre", model="aott",
                       DIR_STATIC="/elsewhere/Static",
                       DIR_DAVIS="/elsewhere/D")
    assert cfg.DIR_STATIC == "/elsewhere/Static"
    assert cfg.DIR_DAVIS == "/elsewhere/D"
    # underived keys still follow DIR_DATA
    assert cfg.DIR_YTB == os.path.join(cfg.DIR_DATA, "YTB")
    # and DIR_DATA itself still derives everything when not overridden
    cfg2 = build_config(stage="pre", model="aott", DIR_DATA="/data")
    assert cfg2.DIR_STATIC == os.path.join("/data", "Static")


def test_eval_cli_flag_overrides():
    """--amp/--lstt_num/--max_id_num map to config keys the way the
    reference CLI does (reference tools/eval.py:34,37,57,72-80)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from eval import build_overrides, build_parser

    parser = build_parser()

    args = parser.parse_args(["--amp"])
    over = build_overrides(args)
    assert over["TEST_DTYPE"] == "bfloat16"
    cfg = build_config(stage="pre", model="aott", **over)
    assert cfg.TEST_DTYPE == "bfloat16"

    args = parser.parse_args(["--lstt_num", "2", "--max_id_num", "5"])
    over = build_overrides(args)
    cfg = build_config(stage="pre", model="aotb", **over)
    assert cfg.MODEL_LSTT_NUM == 2      # aotb default is 3
    assert cfg.MODEL_MAX_OBJ_NUM == 5   # default is 10

    # defaults leave the model keys untouched
    over = build_overrides(parser.parse_args([]))
    assert "MODEL_LSTT_NUM" not in over and "MODEL_MAX_OBJ_NUM" not in over
    assert "TEST_DTYPE" not in over
