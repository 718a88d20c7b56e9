from arco_tpu.eval.slice2d import test_single_volume_2d, evaluate_2d  # noqa: F401
from arco_tpu.eval.sliding_window import test_single_case_3d, evaluate_3d  # noqa: F401
