"""Capture a jax.profiler trace + compiled HLO of the generator forward on the
real TPU chip (bf16, fake params). Trace -> /tmp/inf_trace2, HLO ->
/tmp/gen_hlo2.txt."""
import dataclasses, os, sys
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import jax, jax.numpy as jnp
from scrabblegan_tpu.config import Config, SharedSpecs
from scrabblegan_tpu.train.state import build_models
from scrabblegan_tpu.utils.cache import enable_compilation_cache
from scrabblegan_tpu.utils.fakeparams import fake_variables
enable_compilation_cache()
tpu_dev = jax.devices()[0]; cpu_dev = jax.devices("cpu")[0]
batch, length = 1024, 5
cfg = Config(shared=dataclasses.replace(
    SharedSpecs(), batch_size=batch, z_source="noise", dtype="bfloat16"))
gen = build_models(cfg, use_pallas_attention=True).generator
labels = jnp.zeros((batch, length), jnp.int32)
with jax.default_device(cpu_dev):
    z0 = jax.random.normal(jax.random.PRNGKey(0), (batch, cfg.shared.latent_dim))
    shapes = jax.eval_shape(lambda: gen.init(jax.random.PRNGKey(0), labels, z=z0, train=False))
    variables = fake_variables(shapes)
variables = jax.device_put(variables, tpu_dev)
labels_d = jax.device_put(labels, tpu_dev)
z0 = jax.device_put(z0, tpu_dev)
jax.block_until_ready(variables)
fwd = jax.jit(lambda v, l, z: gen.apply(v, l, z=z, train=False))
out = fwd(variables, labels_d, z0); _ = float(out[0,0,0,0].astype(jnp.float32))
import shutil; shutil.rmtree('/tmp/inf_trace2', ignore_errors=True)
with jax.profiler.trace("/tmp/inf_trace2"):
    for i in range(5):
        out = fwd(variables, labels_d, z0)
    _ = float(out[0,0,0,0].astype(jnp.float32))
txt = fwd.lower(variables, labels_d, z0).compile().as_text()
open('/tmp/gen_hlo2.txt', 'w').write(txt)
print("done")
