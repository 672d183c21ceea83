"""Round-2 probe: dump the optimized HLO of the current forward and map the
expensive fusions (probe20 ranking) to source ops via op_name metadata."""
import sys, os, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)

B = 1
z = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))
t_b = jnp.zeros((B,), jnp.int32)

fwd = jax.jit(lambda p, z, t, c: ld.unet_apply({"params": p}, z, t, c))
compiled = fwd.lower(params["unet"], z, t_b, zc).compile()
txt = compiled.as_text()
with open("/tmp/fwd_opt.hlo", "w") as f:
    f.write(txt)
print("bytes", len(txt), flush=True)

# For each fusion computation, print its root + the op_names of its dots/convs.
for target in sys.argv[1:]:
    pat = re.compile(rf"%{re.escape(target)} = .*")
    for m in pat.finditer(txt):
        print("\n####", m.group(0)[:300], flush=True)
