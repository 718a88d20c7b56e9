from arco_tpu.augment.photometric import (  # noqa: F401
    color_jitter, random_gaussian_blur, batch_photometric)
from arco_tpu.augment.mixing import (  # noqa: F401
    generate_cutout_mask, generate_class_mask, generate_unsup_data)
from arco_tpu.augment.tps import TPSGridGen, RandTPS, make_rand_tps_grid  # noqa: F401
from arco_tpu.augment.morph import AdvMorph, adv_morph_batch  # noqa: F401
