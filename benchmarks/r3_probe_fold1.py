"""Single-config fold probe (one program per process, like round-2 method)."""
import json, sys, time
import numpy as np

def main(fold, batch):
    from bench_core import enable_compile_cache
    enable_compile_cache()
    import dataclasses
    import jax, jax.numpy as jnp
    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1
    m = M1(input_spatial_dims=(20,160,160), input_channels=3, num_classes=2,
           filters=(16,32,64,128,256),
           strides=((1,1,1),(1,2,2),(1,2,2),(2,2,2),(2,2,2)),
           kernel_sizes=((1,3,3),(1,3,3),(3,3,3),(3,3,3),(3,3,3)),
           se_reduction=(8,8,8,8,8), att_sub_samp=((1,1,1),)*4,
           dropout_rate=0.0, summary=False, dtype=jnp.bfloat16,
           init_params=False)
    mode = {"fold": True, "nofold": False, "fwdfold": "forward"}[fold]
    if mode is not True:
        m.net = m.net.clone(conv_cfg=dataclasses.replace(m.net.conv_cfg, fold2d=mode))
    t0 = time.perf_counter()
    params = m.init(0)
    net = m.net
    @jax.jit
    def det(p, v):
        return net.apply({"params": p}, v, train=False)["y_softmax"][..., :2]
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch,20,160,160,3)), jnp.bfloat16)
    for _ in range(2):
        jax.block_until_ready(det(params, x))
    print(f"# init+compile {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        for _ in range(10):
            out = det(params, x)
        jax.block_until_ready(out)
        np.asarray(out.ravel()[0])
        best = min(best, (time.perf_counter()-t1)/10)
    print(json.dumps({f"{fold}_b{batch}":
                      {"ms": round(best*1e3,1), "vps": round(batch/best,1)}}), flush=True)

if __name__ == "__main__":
    main(fold=sys.argv[1], batch=int(sys.argv[2]))
