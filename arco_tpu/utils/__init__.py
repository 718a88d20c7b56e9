from arco_tpu.utils import ramps, tree, metrics  # noqa: F401
