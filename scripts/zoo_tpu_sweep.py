"""Model-zoo TPU sweep: compile+run every factory key on the real chip.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/zoo_tpu_sweep.py
"""
"""Compile+run every factory model on the real TPU chip at small size."""
import traceback
import jax, jax.numpy as jnp
from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from arco_tpu.models import net_factory, net_factory_3d

KEYS_2D = ["unet", "unet_ds", "unet_cct", "unet_urpc", "enet", "pnet",
           "nnUNet", "ViT_Seg", "efficient_unet", "swin_unet", "unet_har",
           "unet_stego"]
KEYS_3D = ["vnet", "unet_3D", "unet_3D_dv_semi", "attention_unet",
           "voxresnet", "nnUNet"]

def run(name, make, shape):
    try:
        model = make()
        x = jnp.zeros(shape, jnp.bfloat16)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(0)}, x,
                               train=False)
        out = model.apply(variables, x, train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        first = out[0] if isinstance(out, (tuple, list)) else out
        v = float(jnp.sum(jnp.asarray(first, jnp.float32)))
        print(f"OK   {name:20s} out0 {tuple(first.shape)} sum finite={v==v}", flush=True)
    except Exception as e:
        print(f"FAIL {name:20s} {type(e).__name__}: {str(e)[:140]}", flush=True)

for k in KEYS_2D:
    hw = 224 if k in ("ViT_Seg", "swin_unet") else 128
    run(k, lambda k=k: net_factory(k, in_chns=1, class_num=4,
                                   dtype=jnp.bfloat16), (1, hw, hw, 1))
for k in KEYS_3D:
    run("3d:" + k, lambda k=k: net_factory_3d(k, in_chns=1, class_num=2,
                                              dtype=jnp.bfloat16),
        (1, 64, 64, 32, 1))
print("sweep complete", flush=True)
