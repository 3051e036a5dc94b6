"""TF numerical oracles for the PROBABILISTIC and CASCADED M1 graphs
(VERDICT r2 item 3).

The round-1/2 oracle covered only the deterministic M1
(test_tf_parity.py::test_full_m1_forward_parity). These tests push the
reference's actual selling points through TF side by side:

* the five-pass hierarchical probabilistic graph
  (reference networks.py:348-391): shared weights imported into both
  frameworks, IDENTICAL latents injected on both sides (z_q for the
  posterior sample pass, z_p for the prior inference pass; the mean pass is
  deterministic), asserting prob_train_conv / prob_infer_conv / prob_kl /
  prob_softmax (incl. the deep-supervision concat quirk, networks.py:388-389)
  at atol <= 1e-3;
* the cascaded two-stage composition (networks.py:108-193): stage-2 input
  wiring (stage-1 softmax[..., :nc-1] ++ image_2) and noisy-or fusion.
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

pytestmark = pytest.mark.slow  # builds full (tiny) M1 graphs in TF and JAX

FILTERS = (4, 8, 12, 16, 24)
STRIDES = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
KERNELS = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
SE = (2, 2, 2, 2, 2)
SPATIAL = (4, 16, 16)
DIMS = (2, 1, 1, 0)


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def _level_dims(spatial, strides):
    dims = []
    cur = tuple(spatial)
    for s in strides:
        cur = tuple(-(-c // st) for c, st in zip(cur, s))
        dims.append(cur)
    return dims  # dims[l] = spatial at level l+1 (after stride l)


def test_probabilistic_five_pass_oracle():
    from tf_prob_twin import ProbM1Twin

    from prostatemr_3d_cad_cspca_tpu.models import M1
    from prostatemr_3d_cad_cspca_tpu.ops.distributions import kl_diag_gaussians
    from prostatemr_3d_cad_cspca_tpu.utils.tf_import import (
        import_keras_m1_prob_weights)

    B, C = 2, 3
    image = _rand((B, *SPATIAL, C), 1)
    label = (np.abs(_rand((B, *SPATIAL, 1), 2)) > 0.8).astype(np.float32)
    lv = _level_dims(SPATIAL, STRIDES)  # lv[l-1] = spatial after stride l-1
    # ladder step i predicts its Gaussian on the level-(4-i) feature grid:
    # i=0 on convm (level 4 = lv[4]), i=1 on the level-3 decoder features...
    z_spatial = [lv[4], lv[3], lv[2], lv[1]]
    z_q = [None if DIMS[i] == 0 else _rand((B, *z_spatial[i], DIMS[i]), 10 + i)
           for i in range(4)]
    z_p = [None if DIMS[i] == 0 else _rand((B, *z_spatial[i], DIMS[i]), 20 + i)
           for i in range(4)]

    twin = ProbM1Twin(num_classes=2, filters=FILTERS, strides=STRIDES,
                      kernels=KERNELS, se_reduction=SE,
                      prob_latent_dims=DIMS, deep_supervision=True)
    tf_out = twin.forward(image, label, z_q, z_p)

    model = M1(
        input_spatial_dims=SPATIAL, input_channels=C + 1, num_classes=2,
        filters=FILTERS, strides=STRIDES, kernel_sizes=KERNELS,
        se_reduction=SE, att_sub_samp=((1, 1, 1),) * 4,
        probabilistic=True, prob_latent_dims=DIMS, deep_supervision=True,
        dropout_rate=0.0, summary=False)
    params = import_keras_m1_prob_weights(
        twin.weighted_layers(), model.params, prob_latent_dims=DIMS,
        deep_supervision=True)

    def oracle(m, image, label, z_q, z_p):
        """Reference five-pass composition (networks.py:348-391) with
        injected latents — mirrors M1Net.__call__'s fused path but with
        externally-supplied z."""
        image_label = jnp.concatenate([image, label], axis=-1)
        q_trunk = m.posterior.trunk(image_label, False)
        q_sample_l = m.posterior.ladder(q_trunk, prob_z_q=z_q)
        q_mean_l = m.posterior.ladder(q_trunk, prob_mean=True)
        p_trunk = m.prior.trunk(image, False)
        p_sample_l = m.prior.ladder(p_trunk, prob_z_q=z_p)
        p_zq_l = m.prior.ladder(
            p_trunk, prob_z_q=q_sample_l["prob_used_latents"])
        p_zq_mean_l = m.prior.ladder(
            p_trunk, prob_z_q=q_mean_l["prob_used_latents"])
        infer_conv = m.final_decoder(p_sample_l["prob_decoder_features"])
        train_conv = m.final_decoder(p_zq_mean_l["prob_decoder_features"])
        kl_total = jnp.zeros((), jnp.float32)
        for q, p in zip(q_sample_l["prob_distributions"],
                        p_zq_l["prob_distributions"]):
            if q is None or p is None:
                continue
            kl_vox = kl_diag_gaussians(q, p)
            kl_total = kl_total + jnp.mean(
                jnp.sum(kl_vox, axis=tuple(range(1, kl_vox.ndim))))
        p_zq_mean = m.prior.assemble_outputs(p_trunk, p_zq_mean_l)
        prob_softmax = jnp.concatenate(
            [jax.nn.softmax(train_conv, axis=-1),
             p_zq_mean["y_softmax"][..., 2:]], axis=-1)
        return dict(prob_train_conv=train_conv, prob_infer_conv=infer_conv,
                    prob_kl=kl_total, prob_softmax=prob_softmax)

    jx = model.net.apply(
        {"params": params}, jnp.asarray(image), jnp.asarray(label),
        tuple(None if z is None else jnp.asarray(z) for z in z_q),
        tuple(None if z is None else jnp.asarray(z) for z in z_p),
        method=oracle)

    np.testing.assert_allclose(
        np.asarray(jx["prob_train_conv"]), tf_out["prob_train_conv"], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jx["prob_infer_conv"]), tf_out["prob_infer_conv"], atol=1e-3)
    np.testing.assert_allclose(
        float(jx["prob_kl"]), tf_out["prob_kl"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jx["prob_softmax"]), tf_out["prob_softmax"], atol=1e-3)
    assert jx["prob_softmax"].shape == (B, *SPATIAL, 8)  # 4 softmax groups


def test_cascaded_two_stage_oracle():
    from tf_cpu_baseline import build_m1_tf

    from prostatemr_3d_cad_cspca_tpu.models import M1
    from prostatemr_3d_cad_cspca_tpu.utils.tf_import import (
        import_keras_m1_weights)

    B, C = 1, 3
    img1 = _rand((B, *SPATIAL, C), 5)
    img2 = _rand((B, *SPATIAL, C), 6)

    tf1 = build_m1_tf(input_shape=(*SPATIAL, C), num_classes=2,
                      filters=FILTERS, strides=STRIDES, kernels=KERNELS,
                      se_reduction=SE)
    tf2 = build_m1_tf(input_shape=(*SPATIAL, C + 1), num_classes=2,
                      filters=FILTERS, strides=STRIDES, kernels=KERNELS,
                      se_reduction=SE)
    # reference cascaded wiring (networks.py:135-136, 160-165)
    s1 = tf1(tf.constant(img1), training=False)
    s2_in = tf.concat([s1[..., :1], tf.constant(img2)], axis=-1)
    s2 = tf2(s2_in, training=False)
    prior, follow = s1[..., 1], s2[..., 1]
    joint = 1.0 - (1.0 - prior) * (1.0 - follow)          # noisy-or
    tf_det2 = tf.stack([1.0 - joint, joint], axis=-1).numpy()
    tf_det1 = tf.stack([1.0 - prior, prior], axis=-1).numpy()

    model = M1(
        input_spatial_dims=SPATIAL, input_channels=C, num_classes=2,
        filters=FILTERS, strides=STRIDES, kernel_sizes=KERNELS,
        se_reduction=SE, att_sub_samp=((1, 1, 1),) * 4,
        cascaded="noisy-or", dropout_rate=0.0, summary=False)
    params = dict(model.params)
    params["stage1"] = import_keras_m1_weights(
        tf1.layers, {"core": model.params["stage1"]["core"]})
    params["stage2"] = import_keras_m1_weights(
        tf2.layers, {"core": model.params["stage2"]["core"]})

    out = model.apply(params, (jnp.asarray(img1), jnp.asarray(img2)))
    np.testing.assert_allclose(
        np.asarray(out["detection_1"]), tf_det1, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["detection_2"]), tf_det2, atol=1e-3)
