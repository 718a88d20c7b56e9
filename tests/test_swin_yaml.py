"""Reference Swin yaml recipe ingestion (networks/config.py:175-229):
BASE chaining, opts overrides, and SwinUnet construction."""

import numpy as np
import pytest

yaml = pytest.importorskip("yaml")

from arco_tpu.compat.swin_config import (build_swin_from_yaml,  # noqa: E402
                                         load_swin_yaml,
                                         swin_kwargs_from_yaml)

BASE_YAML = """\
MODEL:
  SWIN:
    EMBED_DIM: 96
    WINDOW_SIZE: 7
"""

# the published swin_tiny_patch4_window7_224_lite recipe shape
CHILD_YAML = """\
BASE: ['base.yaml']
MODEL:
  TYPE: swin
  NAME: swin_tiny_patch4_window7_224
  DROP_PATH_RATE: 0.2
  SWIN:
    DEPTHS: [ 2, 2, 6, 2 ]
    DECODER_DEPTHS: [ 2, 2, 2, 1 ]
    NUM_HEADS: [ 3, 6, 12, 24 ]
"""


@pytest.fixture
def cfg_dir(tmp_path):
    (tmp_path / "base.yaml").write_text(BASE_YAML)
    (tmp_path / "tiny.yaml").write_text(CHILD_YAML)
    return tmp_path


def test_base_chain_and_defaults(cfg_dir):
    flat = load_swin_yaml(str(cfg_dir / "tiny.yaml"))
    assert flat["MODEL.SWIN.EMBED_DIM"] == 96        # from BASE
    assert flat["MODEL.DROP_PATH_RATE"] == 0.2       # file overrides default
    assert flat["MODEL.SWIN.DEPTHS"] == [2, 2, 6, 2]
    assert flat["MODEL.SWIN.QKV_BIAS"] is True       # yacs default survives


def test_opts_merge_list(cfg_dir):
    flat = load_swin_yaml(str(cfg_dir / "tiny.yaml"),
                          opts=["MODEL.SWIN.WINDOW_SIZE", "8",
                                "MODEL.SWIN.APE", "true"])
    assert flat["MODEL.SWIN.WINDOW_SIZE"] == 8
    assert flat["MODEL.SWIN.APE"] is True


def test_kwargs_and_forward(cfg_dir):
    import jax
    import jax.numpy as jnp

    kw = swin_kwargs_from_yaml(str(cfg_dir / "tiny.yaml"),
                               img_size=64, num_classes=4, in_chns=1,
                               window_size=2)
    assert kw["depths"] == (2, 2, 6, 2)
    assert kw["depths_decoder"] == (2, 2, 2, 1)
    assert kw["drop_path_rate"] == 0.2
    # 64/4 = 16 tokens halved by 3 merges -> window 2 divides every stage
    model = build_swin_from_yaml(str(cfg_dir / "tiny.yaml"),
                                 img_size=64, num_classes=4, in_chns=1,
                                 window_size=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 1), jnp.float32)
    var = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(var, x, train=False)[0]
    assert logits.shape == (1, 64, 64, 4)
