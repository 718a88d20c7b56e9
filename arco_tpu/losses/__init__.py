from arco_tpu.losses.supervised import (  # noqa: F401
    cross_entropy, dice_loss, DiceLossState, kld_batchmean, softmax_mse_loss,
    softmax_kl_loss, entropy_loss, focal_loss)
from arco_tpu.losses.consistency import (  # noqa: F401
    compute_unsupervised_loss, revisiting_loss, equivariance_loss)
from arco_tpu.losses.contrastive import (  # noqa: F401
    MemoBank, create_memobank, compute_contra_memobank_loss)
from arco_tpu.losses.extras import (  # noqa: F401
    info_nce, compute_reco_loss, ohem_cross_entropy, soft_dice_loss,
    sup_con_loss, local_con_loss, sup_con_seg_loss, criterion,
    criterion_ohem, weighted_mse_loss)
