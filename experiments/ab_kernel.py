"""A/B: old unconditional-unroll kernel vs new cond-guarded kernel."""
import importlib.util
import sys, time
from functools import partial
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from bench import synth_snapshot
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex

spec = importlib.util.spec_from_file_location("old_membership", "/tmp/old_membership.py")
old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old)
from spaghettisearch_tpu.ops.kernels import membership as new

@partial(jax.jit, static_argnames=("which",))
def run(tft, tfw, bft, bfw, tq, qn, *, which):
    if which == "old":
        out = old.pallas_forward_scores_2sec(tft, tfw, bft, bfw, tq, doc_block=512)
    elif which == "new":
        out = new.pallas_forward_scores_2sec(tft, tfw, bft, bfw, tq, doc_block=512)
    else:
        ts, _, bs, _ = new.pallas_forward_scores_2sec(
            tft, tfw, bft, bfw, tq, qn, doc_block=512, emit_counts=False)
        out = (ts, bs)
    return sum(o[:, ::1024].sum() for o in out if o is not None)

def main():
    print("backend:", jax.default_backend())
    snap = synth_snapshot(n_docs=1_000_000, n_words=200_000,
                          body_terms_per_doc=48, title_terms_per_doc=4,
                          max_df=32_768)
    idx = DeviceIndex.from_snapshot(snap)
    rng = np.random.default_rng(1)
    df = np.diff(snap.body.post_offsets).astype(np.float64); p = df/df.sum()
    B = 256
    tq = jnp.asarray(rng.choice(200_000, size=(B,4), p=p).astype(np.int32))
    t = idx.title.fwd; b = idx.body.fwd
    qn = jnp.full((B,), 4, jnp.int32)

    def bench(name, which, reps=10):
        float(run(t.ftT, t.fwT, b.ftT, b.fwT, tq, qn, which=which))
        t0 = time.perf_counter()
        vals = [run(t.ftT, t.fwT, b.ftT, b.fwT, tq, qn, which=which)
                for _ in range(reps)]
        float(vals[-1])
        dt = (time.perf_counter()-t0)/reps
        print(f"{name:40s}: {dt*1e3:8.2f} ms ({B/dt:8.0f} qps)")

    bench("old kernel (4 outputs)", "old")
    bench("new kernel qn=None counts=True", "new")
    bench("new kernel qn=4 counts=False", "new_nc")

if __name__ == "__main__":
    main()
