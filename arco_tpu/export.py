"""AOT model export for serving (jax.export / StableHLO).

The reference's deployment story stops at ``torch.save(state_dict)`` plus
re-importing the model-zoo code to rebuild the module before inference
(test_2D.py:117-122, test.py:197-205). For TPU serving the natural
artifact is an ahead-of-time exported XLA program: ``jax.export``
serializes the traced computation (StableHLO) together with its calling
convention, so a serving process can deserialize and run the predictor
WITHOUT the model-zoo code, flax, or a checkpoint — the weights are baked
into the artifact as constants.

Properties that matter for production:

- **Self-contained**: one file = architecture + weights + lowering. No
  version skew between the training repo and the server.
- **Multi-platform**: ``platforms=("tpu", "cpu")`` bakes lowerings for
  both, so the same artifact serves on a TPU pod and on a CPU canary.
- **Optionally batch-polymorphic**: ``batch="dynamic"`` exports with a
  symbolic batch dimension so one artifact serves any request batch size
  (models whose forward is shape-polymorphic in batch — the conv zoo is;
  see the note on ``jax.image.resize`` below).
- **Stable across jax versions** within the export compatibility window
  (StableHLO serialization is the long-term-support format).

Typical flow::

    exported = export_predictor(model, params, batch_stats,
                                input_shape=(8, 256, 256, 1))
    save_predictor("unet_acdc.stablehlo", exported)
    # ... on the serving host (only jax required):
    predict = load_predictor("unet_acdc.stablehlo")
    seg = predict(x)          # [8, 256, 256] int32 argmax labels

CLI: ``python -m arco_tpu.cli.export_model --exp ... --iteration 30000``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

OUTPUTS = ("argmax", "softmax", "logits")


def make_predict_fn(model, variables: dict, output: str = "argmax",
                    dtype=jnp.float32) -> Callable:
    """Inference closure over baked-in variables.

    ``model.apply`` follows the zoo forward contract
    (logits, latent, feature_maps) — unetWithArgs.py:345-348; only the
    logits head is exported. ``dtype`` is the artifact's input dtype: the
    exported calling convention expects it and the internal cast matches,
    so e.g. ``dtype=jnp.bfloat16`` yields a genuinely bf16-in program.
    """
    if output not in OUTPUTS:
        raise ValueError(f"output must be one of {OUTPUTS}, got {output!r}")

    def predict(x):
        logits = model.apply(variables, x.astype(dtype), train=False,
                             rngs={"dropout": jax.random.PRNGKey(0)})[0]
        logits = logits.astype(jnp.float32)
        if output == "argmax":
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if output == "softmax":
            return jax.nn.softmax(logits, axis=-1)
        return logits

    return predict


def export_predictor(model, params: Any, batch_stats: Any,
                     input_shape: Sequence[int], *,
                     output: str = "argmax",
                     batch: str = "static",
                     platforms: Optional[Sequence[str]] = None,
                     dtype=jnp.float32) -> jexport.Exported:
    """Trace + lower the predictor to a serializable Exported object.

    input_shape: ``[B, *spatial, C_in]``. With ``batch="dynamic"`` the
    leading dimension is exported symbolically (any B at call time); note
    models whose forward computes ``jax.image.resize`` target shapes from
    ``x.shape`` (the U-Net bilinear-upsample decoders) stay traceable
    because only spatial dims — which remain static — feed the resize.
    """
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    fn = jax.jit(make_predict_fn(model, variables, output, dtype))

    if batch == "dynamic":
        b = jexport.symbolic_shape("b")[0]
        shape: Tuple[Any, ...] = (b,) + tuple(input_shape[1:])
    elif batch == "static":
        shape = tuple(input_shape)
    else:
        raise ValueError(f"batch must be 'static' or 'dynamic', got "
                         f"{batch!r}")
    spec = jax.ShapeDtypeStruct(shape, dtype)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(fn, **kwargs)(spec)


def save_predictor(path: str, exported: jexport.Exported) -> None:
    with open(path, "wb") as f:
        f.write(bytes(exported.serialize()))


def load_predictor(path: str) -> Callable:
    """Deserialize an artifact and return ``predict(x) -> array``.

    Needs only jax on the serving host — no arco_tpu model code, no flax,
    no checkpoint files.
    """
    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    in_aval = exported.in_avals[0]

    @functools.wraps(exported.call)
    def predict(x):
        x = jnp.asarray(x, in_aval.dtype)
        # symbolic batch dims compare unequal to ints; check the static ones
        static_ok = all(
            not isinstance(want, int) or got == want
            for got, want in zip(x.shape, in_aval.shape))
        if x.ndim != len(in_aval.shape) or not static_ok:
            raise ValueError(
                f"input shape {x.shape} does not match the exported "
                f"calling convention {in_aval.shape}")
        return exported.call(x)

    predict.exported = exported
    return predict
