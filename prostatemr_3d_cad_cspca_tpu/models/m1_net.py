"""M1 network wiring: deterministic / hierarchical-probabilistic / cascaded.

Parity targets:
  * ``m1(...)`` builder          — reference networks.py:232-392
  * cascaded two-stage wiring    — reference networks.py:108-193
  * ``decision_fusion``          — reference networks.py:208-223

TPU-first restructure (the reference's main inefficiency, SURVEY.md §3.2):
the reference invokes the FULL prior network three times and the posterior
twice per training step (networks.py:348-352) even though the five passes
differ only in the cheap latent ladder. Here each network's trunk runs ONCE
and only the ladder re-runs per latent configuration (``fused_prob_passes``,
default True). Exact five-pass reference semantics (independent dropout draws
per pass) remain available with ``fused_prob_passes=False`` for parity
checking.

Known reference defect handled (SURVEY.md §2.3-2): the posterior label slice
``inputs[...,-(num_classes-1)-1:-1]`` (networks.py:301) drops the final
channel and feeds the last image channel as "label". Default here implements
the documented intent (label = trailing num_classes-1 channels, as appended
by data_generators.py:82); set ``strict_reference_slicing=True`` to reproduce
the defect bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convolution import ConvConfig
from ..ops.distributions import kl_diag_gaussians
from ..ops.normalization import ShardedStats
from .blocks import StitchingProbDecoder
from .m1_core import M1Core

Tuple3 = Tuple[int, int, int]


def decision_fusion(
    prior_softmax: jax.Array,
    follow_up_softmax: jax.Array,
    strategy: str = "identity",
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage decision fusion (reference networks.py:208-223).

    Inputs are the positive-class probability maps (B,D,H,W) of each stage;
    returns two 2-channel softmax-style maps (prior_pred, joint_pred).
    """
    if strategy == "identity":
        joint = follow_up_softmax[..., None]
    elif strategy == "noisy-or":
        joint = (1.0 - (1.0 - prior_softmax) * (1.0 - follow_up_softmax))[..., None]
    elif strategy == "bayes":
        num = prior_softmax * follow_up_softmax + 1e-9
        den = num + (1.0 - prior_softmax) * (1.0 - follow_up_softmax)
        joint = (num / den)[..., None]
    else:
        raise ValueError(f"Unknown fusion strategy: {strategy!r}")

    prior_pred = jnp.concatenate(
        [(1.0 - prior_softmax)[..., None], prior_softmax[..., None]], axis=-1)
    joint_pred = jnp.concatenate([1.0 - joint, joint], axis=-1)
    return prior_pred, joint_pred


class M1Net(nn.Module):
    """Single-stage M1 (deterministic or hierarchical probabilistic).

    ``__call__(image, train)`` returns the reference ``m1()`` output dict:
    deterministic -> y_softmax / y_sigmoid / logits / y_
    probabilistic -> prob_softmax / prob_kl / prob_train_conv / prob_infer_conv
    (+ y_softmax of the mean-latent prior pass for deep supervision).
    """

    num_classes: int = 2
    dropout_mode: str = "standard"
    dropout_rate: float = 0.50
    filters: Tuple[int, ...] = (32, 64, 128, 256, 512)
    strides: Tuple[Tuple3, ...] = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (1, 2, 2))
    kernel_sizes: Tuple[Tuple3, ...] = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    se_reduction: Tuple[int, ...] = (8, 8, 8, 8, 8)
    att_sub_samp: Tuple[Tuple3, ...] = ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1))
    conv_cfg: ConvConfig = ConvConfig()
    dense_skip: bool = False
    deep_supervision: bool = False
    probabilistic: bool = False
    prob_latent_dims: Tuple[int, ...] = (1, 1, 1, 1)
    fused_prob_passes: bool = True
    strict_reference_slicing: bool = False
    remat: bool = False
    # Exact cross-shard IN/SE statistics for halo-sharded spatial SPMD
    # (set via net.clone(sharded=...) by parallel.halo.spatial_infer_m1).
    sharded: Optional[ShardedStats] = None

    def _core_kwargs(self):
        return dict(
            num_classes=self.num_classes,
            dropout_mode=self.dropout_mode,
            dropout_rate=self.dropout_rate,
            filters=tuple(self.filters),
            strides=tuple(tuple(s) for s in self.strides),
            kernel_sizes=tuple(tuple(k) for k in self.kernel_sizes),
            se_reduction=tuple(self.se_reduction),
            att_sub_samp=tuple(tuple(a) for a in self.att_sub_samp),
            conv_cfg=self.conv_cfg,
            dense_skip=self.dense_skip,
            probabilistic=self.probabilistic,
            prob_latent_dims=tuple(self.prob_latent_dims),
            remat=self.remat,
            sharded=self.sharded,
        )

    def setup(self):
        if not self.probabilistic:
            self.core = M1Core(
                deep_supervision=self.deep_supervision, **self._core_kwargs())
        else:
            # Prior (images) + posterior (images+labels) nets, networks.py:304-335.
            self.prior = M1Core(
                deep_supervision=self.deep_supervision, **self._core_kwargs())
            self.posterior = M1Core(
                deep_supervision=False, **self._core_kwargs())
            # Final stitched-logits decoder, networks.py:338-345.
            self.final_decoder = StitchingProbDecoder(
                num_classes=self.num_classes, conv_cfg=self.conv_cfg)

    def __call__(self, inputs: jax.Array, train: bool = False) -> Dict[str, Any]:
        if not self.probabilistic:
            out = self.core(inputs, train=train)
            return dict(
                y_softmax=out["y_softmax"], y_sigmoid=out["y_sigmoid"],
                logits=out["logits"], y_=out["y_"])

        # ---- probabilistic path (networks.py:296-391) -----------------------
        n_lbl = self.num_classes - 1
        image = inputs[..., : inputs.shape[-1] - n_lbl]
        if self.strict_reference_slicing:
            label = inputs[..., -(n_lbl) - 1 : -1]  # reference defect, networks.py:301
        else:
            label = inputs[..., inputs.shape[-1] - n_lbl :]
        image_label = jnp.concatenate([image, label], axis=-1)

        if self.fused_prob_passes:
            # Trunks once per network; ladders per latent configuration.
            q_trunk = self.posterior.trunk(image_label, train)
            q_sample_l = self.posterior.ladder(q_trunk, prob_mean=False, train=train)
            q_mean_l = self.posterior.ladder(q_trunk, prob_mean=True, train=train)

            p_trunk = self.prior.trunk(image, train)
            p_sample_l = self.prior.ladder(p_trunk, prob_mean=False, train=train)
            p_zq_l = self.prior.ladder(
                p_trunk, prob_z_q=q_sample_l["prob_used_latents"], train=train)
            p_zq_mean_l = self.prior.ladder(
                p_trunk, prob_z_q=q_mean_l["prob_used_latents"], train=train)

            q_sample = self.posterior.assemble_outputs(q_trunk, q_sample_l)
            p_sample = self.prior.assemble_outputs(p_trunk, p_sample_l)
            p_sample_z_q = self.prior.assemble_outputs(p_trunk, p_zq_l)
            p_sample_z_q_mean = self.prior.assemble_outputs(p_trunk, p_zq_mean_l)
        else:
            # Exact reference wiring: five full passes (networks.py:348-352).
            q_sample = self.posterior(image_label, prob_mean=False, train=train)
            q_mean = self.posterior(image_label, prob_mean=True, train=train)
            p_sample = self.prior(image, prob_mean=False, train=train)
            p_sample_z_q = self.prior(
                image, prob_z_q=q_sample["prob_used_latents"], train=train)
            p_sample_z_q_mean = self.prior(
                image, prob_z_q=q_mean["prob_used_latents"], train=train)

        # Latent-injected logits (networks.py:355-356).
        infer_conv = self.final_decoder(p_sample["prob_decoder_features"])
        train_conv = self.final_decoder(p_sample_z_q_mean["prob_decoder_features"])

        # KL(Q||P) per level: sum voxels, mean batch, sum levels
        # (networks.py:373-385).
        kl_total = jnp.zeros((), jnp.float32)
        for q, p in zip(q_sample["prob_distributions"], p_sample_z_q["prob_distributions"]):
            if q is None or p is None:
                continue
            kl_voxel = kl_diag_gaussians(q, p)                  # (B,D,H,W)
            kl_inst = jnp.sum(kl_voxel, axis=tuple(range(1, kl_voxel.ndim)))
            kl_total = kl_total + jnp.mean(kl_inst)

        outputs: Dict[str, Any] = dict(
            prob_infer_conv=infer_conv,
            prob_train_conv=train_conv,
            prob_kl=kl_total,
        )
        if self.deep_supervision:
            # networks.py:388-389: stitch ds softmaxes of the mean-latent pass.
            outputs["prob_softmax"] = jnp.concatenate(
                [jax.nn.softmax(train_conv, axis=-1),
                 p_sample_z_q_mean["y_softmax"][..., self.num_classes:]], axis=-1)
        else:
            outputs["prob_softmax"] = jax.nn.softmax(train_conv, axis=-1)
        outputs["infer_softmax"] = jax.nn.softmax(infer_conv, axis=-1)
        return outputs


class M1CascadedNet(nn.Module):
    """Two-stage cascaded M1 with decision fusion (reference networks.py:108-193).

    ``__call__((image_1, image_2), train)`` -> dict with detection_1/_2 (+
    KL_1/_2 and infer fusion outputs when probabilistic). Stage 2 consumes the
    stage-1 softmax's leading num_classes-1 channels concatenated onto
    image_2 (networks.py:135-136).
    """

    num_classes: int = 2
    fusion: str = "identity"  # reference passes `cascaded` string as strategy
    stage_kwargs: Any = None  # dict of M1Net fields shared by both stages
    sharded: Optional[ShardedStats] = None

    def setup(self):
        kw = dict(self.stage_kwargs or {})
        kw["num_classes"] = self.num_classes
        kw["sharded"] = self.sharded
        self.stage1 = M1Net(**kw)
        self.stage2 = M1Net(**kw)

    def __call__(self, inputs, train: bool = False) -> Dict[str, Any]:
        image_1, image_2 = inputs
        probabilistic = self.stage1.probabilistic
        nc = self.num_classes

        out1 = self.stage1(image_1, train=train)
        s1_soft = out1["prob_softmax"] if probabilistic else out1["y_softmax"]
        stage2_in = jnp.concatenate([s1_soft[..., : nc - 1], image_2], axis=-1)
        out2 = self.stage2(stage2_in, train=train)
        s2_soft = out2["prob_softmax"] if probabilistic else out2["y_softmax"]

        prior_train, joint_train = decision_fusion(
            s1_soft[..., nc - 1], s2_soft[..., nc - 1], self.fusion)

        outputs: Dict[str, Any] = dict(
            detection_1=prior_train, detection_2=joint_train,
            stage1=out1, stage2=out2)

        if probabilistic:
            inf1 = jax.nn.softmax(out1["prob_infer_conv"], axis=-1)
            inf2 = jax.nn.softmax(out2["prob_infer_conv"], axis=-1)
            prior_inf, joint_inf = decision_fusion(
                inf1[..., nc - 1], inf2[..., nc - 1], self.fusion)
            outputs.update(
                KL_1=out1["prob_kl"], KL_2=out2["prob_kl"],
                infer_softmax_1=inf1, infer_softmax_2=inf2,
                infer_detection_1=prior_inf, infer_detection_2=joint_inf)
        return outputs
