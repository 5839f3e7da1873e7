"""Serving export: serialize the generator forward as a StableHLO bundle.

The reference's serving artifact is a tf.saved_model consumed by
run_inference.py (run_inference.py:22). The JAX-native equivalent is
jax.export: the jitted generator forward (params baked in or passed) is
serialized to portable StableHLO bytes that reload and execute WITHOUT the
model's Python code — the production-serving hand-off format.

Bundle layout: <path>/generator.stablehlo (serialized fn) + meta.json
(word-length, batch, z-source contract).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def export_generator(out_dir: str, generator, variables, batch_size: int,
                     length: int, z_source: str, latent_dim: int = 128,
                     img_hw=(32, 160)) -> str:
    """Serialize generator.apply(variables, labels, <latent>) at fixed shapes.

    Params are baked into the exported computation as constants (the serving
    bundle is self-contained, like a saved_model)."""
    from jax import export as jexport

    labels = jnp.zeros((batch_size, length), jnp.int32)
    if z_source == "style":
        latent = jnp.zeros((batch_size, img_hw[0], img_hw[1], 1), jnp.float32)

        def fn(labels, style_imgs):
            return generator.apply(variables, labels, style_imgs=style_imgs,
                                   train=False)
    else:
        latent = jnp.zeros((batch_size, latent_dim), jnp.float32)

        def fn(labels, z):
            return generator.apply(variables, labels, z=z, train=False)

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(labels.shape, labels.dtype),
        jax.ShapeDtypeStruct(latent.shape, latent.dtype))
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "generator.stablehlo"), "wb") as f:
        f.write(blob)
    meta = {
        "batch_size": batch_size,
        "length": length,
        "z_source": z_source,
        "latent_dim": latent_dim,
        "img_hw": list(img_hw),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_exported_generator(bundle_dir: str):
    """Returns (callable(labels, latent) -> images, meta dict). The callable
    needs no model code — only jax."""
    from jax import export as jexport

    with open(os.path.join(bundle_dir, "generator.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(bundle_dir, "meta.json")) as f:
        meta = json.load(f)

    def call(labels, latent):
        return exported.call(jnp.asarray(labels, jnp.int32),
                             jnp.asarray(latent, jnp.float32))

    return call, meta
