"""Round-3 probe: folded (1,k,k)->2D conv dispatch on the real chip.

Compares the det-M1 bf16 inference iter time with fold2d on vs off at b64,
plus b120 folded (the round-2 headline point: 213.8 ms -> 561 vol/s).
Run standalone on the TPU (no JAX_PLATFORMS=cpu).
"""
import json, sys, time
import numpy as np

def main():
    from bench_core import enable_compile_cache
    enable_compile_cache()
    import jax, jax.numpy as jnp
    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1

    def build(fold):
        import dataclasses
        m = M1(input_spatial_dims=(20,160,160), input_channels=3, num_classes=2,
               filters=(16,32,64,128,256),
               strides=((1,1,1),(1,2,2),(1,2,2),(2,2,2),(2,2,2)),
               kernel_sizes=((1,3,3),(1,3,3),(3,3,3),(3,3,3),(3,3,3)),
               se_reduction=(8,8,8,8,8), att_sub_samp=((1,1,1),)*4,
               dropout_rate=0.0, summary=False, dtype=jnp.bfloat16,
               init_params=False)
        if not fold:
            m.net = m.net.clone(conv_cfg=dataclasses.replace(
                m.net.conv_cfg, fold2d=False))
        return m

    t0 = time.perf_counter()
    m_fold = build(True)
    params = m_fold.init(0)
    print(f"# init {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    res = {}
    for tag, fold, batch in (("fold_b64", True, 64), ("nofold_b64", False, 64),
                             ("fold_b120", True, 120)):
        net = (m_fold if fold else build(False)).net
        @jax.jit
        def det(p, v):
            return net.apply({"params": p}, v, train=False)["y_softmax"][..., :2]
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(batch,20,160,160,3)), jnp.bfloat16)
        t0 = time.perf_counter()
        for _ in range(2):
            jax.block_until_ready(det(params, x))
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(10):
                out = det(params, x)
            jax.block_until_ready(out)
            np.asarray(out.ravel()[0])
            best = min(best, (time.perf_counter()-t1)/10)
        res[tag] = {"ms": round(best*1e3,1), "vps": round(batch/best,1)}
        print(f"# {tag}: {best*1e3:.1f} ms -> {batch/best:.1f} vol/s "
              f"(total {time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)
        print(json.dumps(res), flush=True)

if __name__ == "__main__":
    main()
