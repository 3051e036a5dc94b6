"""Measured TF-CPU baseline for the headline metric (BASELINE.md plan).

The reference stack (TF 2.5 + tfa/tfp/sonnet) cannot run in this image
(tensorflow_addons / tensorflow_probability / sonnet absent), so this script
reconstructs a structurally identical deterministic M1 attention U-Net in
pure tf.keras — same layer graph as reference networks.py:402-630 with
dense_skip=False, probabilistic=False (BASELINE.json config 1) — and measures
CPU inference throughput (volumes/sec) at the production 20x160x160x3
geometry with the CLI-default channel widths (train_model.py:72-74).

Output: benchmarks/baseline_tf_cpu.json consumed by bench.py's vs_baseline.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_m1_tf(
    input_shape=(20, 160, 160, 3),
    num_classes=2,
    filters=(16, 32, 64, 128, 256),
    strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
    kernels=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    se_reduction=(8, 8, 8, 8, 8),
    default_names=False,
):
    import tensorflow as tf
    from tensorflow.keras import layers as L

    if default_names:
        # Reference-as-shipped naming: modelio.py never renames layers, so
        # the published checkpoints carry Keras auto-names ('conv3d_7', ...).
        # Used by the build-order H5 import round-trip test.
        def nm(v):
            return None
    else:
        def nm(v):
            return v

    def instance_norm(name=None):
        return L.GroupNormalization(groups=-1, epsilon=1e-3, name=nm(name))

    def lrelu(x):
        return L.LeakyReLU(negative_slope=0.1)(x)

    # Every weighted layer carries its flax param path as its name, so the
    # weight importer (utils.tf_import) can map by name rather than relying
    # on Keras' topological layer ordering.
    def se_block(x, f, k, s, r, nm_):
        residual = x
        h = L.Conv3D(f // 4, k, strides=s, padding="same", name=nm(f"{nm_}.conv1"))(x)
        h = instance_norm(f"{nm_}.norm1")(h)
        h = lrelu(h)
        h = L.Conv3D(f // 4, (3, 3, 3), padding="same", name=nm(f"{nm_}.conv2"))(h)
        h = instance_norm(f"{nm_}.norm2")(h)
        h = lrelu(h)
        h = L.Conv3D(f, (1, 1, 1), padding="same", name=nm(f"{nm_}.conv3"))(h)
        x_ = instance_norm(f"{nm_}.norm3")(h)
        if x.shape[-1] != f:
            residual = L.Conv3D(f, k, strides=s, padding="same", name=nm(f"{nm_}.conv4"))(residual)
            residual = instance_norm(f"{nm_}.norm4")(residual)
        s_ = L.GlobalAveragePooling3D(keepdims=True)(x_)
        s_ = L.Conv3D(f // r, (1, 1, 1), name=nm(f"{nm_}.se_conv6"))(s_)
        s_ = lrelu(s_)
        s_ = L.Conv3D(f, (1, 1, 1), name=nm(f"{nm_}.se_conv7"))(s_)
        s_ = tf.keras.activations.sigmoid(s_)
        out = x_ * s_ * residual  # multiplicative combine (network_blocks.py:77)
        return lrelu(out)

    def att_gate(x, g, f, nm_):
        theta = L.Conv3D(f, (1, 1, 1), padding="same", name=nm(f"{nm_}.theta"))(x)
        phi = L.Conv3D(f, (1, 1, 1), padding="same", name=nm(f"{nm_}.phi"))(g)
        up = tuple(int(theta.shape[i + 1]) // int(phi.shape[i + 1]) for i in range(3))
        phi = L.UpSampling3D(size=up)(phi)
        a = lrelu(theta + phi)
        psi = L.Conv3D(1, (1, 1, 1), padding="same", name=nm(f"{nm_}.psi"))(a)
        sig = tf.keras.activations.sigmoid(psi)
        up2 = tuple(int(x.shape[i + 1]) // int(sig.shape[i + 1]) for i in range(3))
        sig = L.UpSampling3D(size=up2)(sig)
        y = sig * x
        w = L.Conv3D(f, (1, 1, 1), padding="same", name=nm(f"{nm_}.out"))(y)
        return instance_norm(f"{nm_}.norm_out")(w)

    inp = L.Input(shape=input_shape)
    x = L.Conv3D(filters[0], kernels[0], strides=strides[0], padding="same", name=nm("conve0"))(inp)
    x = instance_norm("norme0")(x)
    x = lrelu(x)
    c1 = se_block(x, filters[1], kernels[1], strides[1], se_reduction[1], "serse1")
    c2 = se_block(c1, filters[2], kernels[2], strides[2], se_reduction[2], "serse2")
    c3 = se_block(c2, filters[3], kernels[3], strides[3], se_reduction[3], "serse3")
    cm = se_block(c3, filters[4], kernels[4], strides[4], se_reduction[4], "serse4")

    a0 = att_gate(x, cm, filters[0], "att0")
    a1 = att_gate(c1, cm, filters[1], "att1")
    a2 = att_gate(c2, cm, filters[2], "att2")
    a3 = att_gate(c3, cm, filters[3], "att3")

    d3 = L.Conv3DTranspose(filters[3], kernels[4], strides=strides[4], padding="same", name=nm("convtd3"))(cm)
    u3 = se_block(L.Concatenate()([d3, a3]), filters[3], kernels[3], (1, 1, 1), se_reduction[3], "sersd3")
    d2 = L.Conv3DTranspose(filters[2], kernels[3], strides=strides[3], padding="same", name=nm("convtd2"))(u3)
    u2 = se_block(L.Concatenate()([d2, a2]), filters[2], kernels[2], (1, 1, 1), se_reduction[2], "sersd2")
    d1 = L.Conv3DTranspose(filters[1], kernels[2], strides=strides[2], padding="same", name=nm("convtd1"))(u2)
    u1 = se_block(L.Concatenate()([d1, a1]), filters[1], kernels[1], (1, 1, 1), se_reduction[1], "sersd1")
    d0 = L.Conv3DTranspose(filters[0], kernels[1], strides=strides[1], padding="same", name=nm("convtd0"))(u1)
    u0 = se_block(L.Concatenate()([d0, a0]), filters[0], kernels[0], (1, 1, 1), se_reduction[0], "sersd0")
    logits = L.Conv3D(num_classes, (1, 1, 1), padding="same", name=nm("logits"))(u0)
    out = L.Softmax()(logits)
    return tf.keras.Model(inp, out)


def main():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    model = build_m1_tf()
    n_params = model.count_params()

    x1 = np.random.default_rng(0).normal(size=(1, 20, 160, 160, 3)).astype(np.float32)
    infer = tf.function(lambda t: model(t, training=False))

    # warmup / trace
    infer(tf.constant(x1)).numpy()
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        infer(tf.constant(x1)).numpy()
    dt = time.perf_counter() - t0
    vps = iters * 1 / dt

    result = {
        "volumes_per_sec": vps,
        "batch": 1,
        "iters": iters,
        "seconds": dt,
        "params": int(n_params),
        "config": "M1 deterministic attention U-Net, 20x160x160x3, "
                  "filters (16,32,64,128,256), CPU fp32",
    }
    out_path = os.path.join(os.path.dirname(__file__), "baseline_tf_cpu.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
