"""Fine-grained encoder timing: where do the 95 ms go? (round 4)"""
import os, sys, time
os.environ.setdefault("VAESNE_BF16", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VAESNE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"))
import numpy as np, jax, jax.numpy as jnp
import bench
from vaesne_tpu.models import PhotometricVAE, PhotoSpecMMVAE, SpectraVAE
from vaesne_tpu.training import init_model

B = int(os.environ.get("PROF_B", "512"))
batch = bench.make_batch(B)
model = PhotoSpecMMVAE(vaes=[
    PhotometricVAE(num_bands=6, latent_len=4, latent_dim=4, model_dim=32, ff_dim=32),
    SpectraVAE(latent_len=4, latent_dim=4, model_dim=32, ff_dim=32)], beta=1.0)
params = init_model(model, batch, jax.random.PRNGKey(0), K=2)

def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    return float(jnp.ravel(leaf)[0])

def timeit(label, fn, *args, steps=6):
    sync(fn(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            o = fn(*args)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{label:40s} {best*1e3:8.3f} ms", flush=True)

sv = {"params": params["vaes_1"]}
pv = {"params": params["vaes_0"]}
spec, photo = batch[1], batch[0]
spec_enc = model.vaes[1]
# embedding-only: run the encoder's token construction via a sub-method probe
flux, wl, phase, mask = spec

@jax.jit
def null_rt(x):  # dispatch floor: one trivial op through the tunnel
    return x[0] * 1.0002
timeit("dispatch floor (1 op)", null_rt, spec)

@jax.jit
def spec_encode(v, s):
    return model.vaes[1].apply(v, s, method="encode")
timeit("spectra encode (B rows)", spec_encode, sv, spec)

@jax.jit
def photo_encode(v, p):
    return model.vaes[0].apply(v, p, method="encode")
timeit("photometric encode (B rows)", photo_encode, pv, photo)

@jax.jit
def both(v0, v1, p, s):
    return (model.vaes[0].apply(v0, p, method="encode"),
            model.vaes[1].apply(v1, s, method="encode"))
timeit("both encoders fused (one program)", both, pv, sv, photo, spec)
