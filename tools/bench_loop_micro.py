import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from vins_tpu.loop.brief import fast_score, fast_detect, brief_describe, smooth_for_brief, hamming_matrix, match_descriptors
from vins_tpu.loop.retrieval import _score_all

H, W = 480, 752
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W), jnp.float32) * 255

def timeit(name, f, iters=30):
    o = f(); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f()
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms")

sm = smooth_for_brief(img)
timeit("fast_score", lambda: fast_score(img))
timeit("fast_detect", lambda: fast_detect(img))
pts, ok = fast_detect(img)
timeit("smooth_for_brief", lambda: smooth_for_brief(img))
timeit("brief_describe_500", lambda: brief_describe(sm, pts))
da = brief_describe(sm, pts)
db2 = jax.random.bernoulli(key, 0.5, (512, 256)).astype(jnp.uint8)
timeit("hamming_512x512", lambda: hamming_matrix(da, db2))
# retrieval over full 2048-kf db
dbase = (jax.random.bernoulli(key, 0.5, (2048, 256, 256)).astype(jnp.int8) * 2 - 1)
dvalid = jnp.ones((2048, 256), bool)
q = da[:256]; qv = ok[:256]
f = lambda q, qv, db, dv: _score_all(q, qv, db, dv, 80.0)
timeit("retrieval_score_2048kf", lambda: f(q, qv, dbase, dvalid))
