"""Keras twin of the reference's HIERARCHICAL PROBABILISTIC M1 graph, for
the numerical oracle tests (VERDICT r2 item 3).

Mirrors /root/reference/tf2.5/scripts/model/unets/networks.py:296-391 layer
by layer: prior + posterior M1Core trunks, the 4-level latent ladder
(mu/logsigma 1x1x1 convs, log-sigma clip +/-0.1, transposed-conv upsampling,
stitch with the trunk's pre-SE concats, SE block per level), the
StitchingProbDecoder final 1x1x1 logits, closed-form KL(Q||P) (sum voxels,
mean batch, sum levels), and the deep-supervision prob_softmax concat
(networks.py:388-389).

Differences by construction (for determinism — the oracle injects latents):
  * ``distrib.sample()`` is replaced by externally-supplied z tensors;
    the mean pass uses mu exactly like the reference (networks.py:648).
  * Dropout is omitted (oracle runs with dropout_rate=0).
  * Each trunk runs once and its ladder re-runs per pass — equal to the
    reference's five full passes when dropout is off.

Every weighted layer is named with its flax param path prefixed by
'prior.'/'posterior.'/'final_decoder.' so utils.tf_import maps by name.
"""

from __future__ import annotations

import numpy as np


class ProbM1Twin:
    def __init__(self, num_classes=2,
                 filters=(4, 8, 12, 16, 24),
                 strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
                 kernels=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
                 se_reduction=(2, 2, 2, 2, 2),
                 prob_latent_dims=(2, 1, 1, 0),
                 deep_supervision=True):
        import tensorflow as tf
        from tensorflow.keras import layers as L

        self.tf, self.L = tf, L
        self.nc = num_classes
        self.filters, self.strides = tuple(filters), tuple(strides)
        self.kernels, self.se_red = tuple(kernels), tuple(se_reduction)
        self.dims = tuple(prob_latent_dims)
        self.deep_supervision = deep_supervision
        self.prior = self._make_core("prior", deep_supervision)
        self.posterior = self._make_core("posterior", False)
        self.final_logits = L.Conv3D(self.nc, (1, 1, 1), padding="same",
                                     name="final_decoder.logits")

    # ------------------------------------------------------------ layer defs
    def _instance_norm(self, name):
        return self.L.GroupNormalization(groups=-1, epsilon=1e-3, name=name)

    def _lrelu(self, x):
        return self.tf.nn.leaky_relu(x, alpha=0.1)

    class _SE:
        """Shared-layer SE bottleneck (network_blocks.py:23-80 incl. the
        multiplicative shortcut combine)."""

        def __init__(self, twin, nm, f, k, s, r):
            self.t, self.nm, self.f = twin, nm, f
            self.k, self.s, self.r = tuple(k), tuple(s), r
            self.cache = {}

        def _get(self, key, make):
            if key not in self.cache:
                self.cache[key] = make()
            return self.cache[key]

        def __call__(self, x):
            t, L, nm, f = self.t, self.t.L, self.nm, self.f
            residual = x
            h = self._get("conv1", lambda: L.Conv3D(
                f // 4, self.k, strides=self.s, padding="same",
                name=f"{nm}.conv1"))(x)
            h = t._lrelu(self._get(
                "norm1", lambda: t._instance_norm(f"{nm}.norm1"))(h))
            h = self._get("conv2", lambda: L.Conv3D(
                f // 4, (3, 3, 3), padding="same", name=f"{nm}.conv2"))(h)
            h = t._lrelu(self._get(
                "norm2", lambda: t._instance_norm(f"{nm}.norm2"))(h))
            h = self._get("conv3", lambda: L.Conv3D(
                f, (1, 1, 1), padding="same", name=f"{nm}.conv3"))(h)
            x_ = self._get("norm3", lambda: t._instance_norm(f"{nm}.norm3"))(h)
            if x.shape[-1] != f:
                residual = self._get("conv4", lambda: L.Conv3D(
                    f, self.k, strides=self.s, padding="same",
                    name=f"{nm}.conv4"))(residual)
                residual = self._get(
                    "norm4", lambda: t._instance_norm(f"{nm}.norm4"))(residual)
            s_ = t.tf.reduce_mean(x_, axis=(1, 2, 3), keepdims=True)
            s_ = t._lrelu(self._get("se_conv6", lambda: L.Conv3D(
                f // self.r, (1, 1, 1), name=f"{nm}.se_conv6"))(s_))
            s_ = t.tf.sigmoid(self._get("se_conv7", lambda: L.Conv3D(
                f, (1, 1, 1), name=f"{nm}.se_conv7"))(s_))
            return t._lrelu(x_ * s_ * residual)

        def layers(self):
            return list(self.cache.values())

    def _make_core(self, prefix, deep_supervision):
        L, f, s, k, r = self.L, self.filters, self.strides, self.kernels, self.se_red
        C = {"prefix": prefix, "ds": deep_supervision}
        C["conve0"] = L.Conv3D(f[0], k[0], strides=s[0], padding="same",
                               name=f"{prefix}.conve0")
        C["norme0"] = self._instance_norm(f"{prefix}.norme0")
        for i in (1, 2, 3, 4):
            C[f"serse{i}"] = self._SE(self, f"{prefix}.serse{i}",
                                      f[i], k[i], s[i], r[i])
        for i in range(4):
            for part, feats in (("theta", f[i]), ("phi", f[i]),
                                ("psi", 1), ("out", f[i])):
                C[f"att{i}.{part}"] = L.Conv3D(
                    feats, (1, 1, 1), padding="same",
                    name=f"{prefix}.att{i}.{part}")
            C[f"att{i}.norm_out"] = self._instance_norm(
                f"{prefix}.att{i}.norm_out")
        C["convtd3"] = L.Conv3DTranspose(f[3], k[4], strides=s[4],
                                         padding="same", name=f"{prefix}.convtd3")
        C["convtd2"] = L.Conv3DTranspose(f[2], k[3], strides=s[3],
                                         padding="same", name=f"{prefix}.convtd2")
        C["convtd1"] = L.Conv3DTranspose(f[1], k[2], strides=s[2],
                                         padding="same", name=f"{prefix}.convtd1")
        C["convtd0"] = L.Conv3DTranspose(f[0], k[1], strides=s[1],
                                         padding="same", name=f"{prefix}.convtd0")
        for i, kk in ((3, k[3]), (2, k[2]), (1, k[1]), (0, k[0])):
            C[f"sersd{i}"] = self._SE(self, f"{prefix}.sersd{i}",
                                      f[i], kk, (1, 1, 1), r[i])
        C["logits"] = L.Conv3D(self.nc, (1, 1, 1), padding="same",
                               name=f"{prefix}.logits")
        if deep_supervision:
            for i in (1, 2, 3):
                C[f"dsy{i}_logits"] = L.Conv3D(
                    self.nc, (1, 1, 1), padding="same",
                    name=f"{prefix}.dsy{i}_logits")
        fr, sr, kr, rr = f[::-1], s[::-1], k[::-1], r[::-1]
        for i in range(4):
            if self.dims[i] != 0:
                C[f"mu_logsig_{i}"] = L.Conv3D(
                    2 * self.dims[i], (1, 1, 1), padding="same",
                    name=f"{prefix}.mu_logsig_{i}")
            C[f"dec_hi_{i}"] = L.Conv3DTranspose(
                fr[i + 1], kr[i], strides=sr[i], padding="same",
                name=f"{prefix}.dec_hi_{i}")
            C[f"sersp_{i}"] = self._SE(self, f"{prefix}.sersp_{i}",
                                       fr[i + 1], kr[i + 1], (1, 1, 1), rr[i + 1])
        return C

    # --------------------------------------------------------------- forward
    def _att(self, C, i, x, g):
        tf, L = self.tf, self.L
        theta = C[f"att{i}.theta"](x)
        phi = C[f"att{i}.phi"](g)
        up = tuple(int(theta.shape[j + 1]) // int(phi.shape[j + 1])
                   for j in range(3))
        phi = L.UpSampling3D(size=up)(phi)
        a = self._lrelu(theta + phi)
        sig = tf.sigmoid(C[f"att{i}.psi"](a))
        up2 = tuple(int(x.shape[j + 1]) // int(sig.shape[j + 1])
                    for j in range(3))
        sig = L.UpSampling3D(size=up2)(sig)
        return C[f"att{i}.norm_out"](C[f"att{i}.out"](sig * x))

    def trunk(self, C, inp):
        """networks.py:568-630 (dense_skip=False, dropout off)."""
        tf = self.tf
        x = self._lrelu(C["norme0"](C["conve0"](inp)))
        conv1 = C["serse1"](x)
        conv2 = C["serse2"](conv1)
        conv3 = C["serse3"](conv2)
        convm = C["serse4"](conv3)
        a0 = self._att(C, 0, x, convm)
        a1 = self._att(C, 1, conv1, convm)
        a2 = self._att(C, 2, conv2, convm)
        a3 = self._att(C, 3, conv3, convm)
        uconv3_ = tf.concat([C["convtd3"](convm), a3], axis=-1)
        uconv3 = C["sersd3"](uconv3_)
        uconv2_ = tf.concat([C["convtd2"](uconv3), a2], axis=-1)
        uconv2 = C["sersd2"](uconv2_)
        uconv1_ = tf.concat([C["convtd1"](uconv2), a1], axis=-1)
        uconv1 = C["sersd1"](uconv1_)
        uconv0_ = tf.concat([C["convtd0"](uconv1), a0], axis=-1)
        uconv0 = C["sersd0"](uconv0_)
        return dict(convm=convm, uconv3_=uconv3_, uconv2_=uconv2_,
                    uconv1_=uconv1_, uconv0_=uconv0_,
                    logits=C["logits"](uconv0))

    def ladder(self, C, tr, z_inject=None, mean=False):
        """networks.py:633-734: per level predict mu/logsigma, choose z
        (injected > mean), upsample [z, features], stitch, SE."""
        tf = self.tf
        skip = [tr["uconv3_"], tr["uconv2_"], tr["uconv1_"], tr["uconv0_"]]
        features = tr["convm"]
        dists, used, ds_ops = [], [], []
        for i in range(4):
            if self.dims[i] != 0:
                ml = C[f"mu_logsig_{i}"](features)
                mu = ml[..., : self.dims[i]]
                logsig = ml[..., self.dims[i]:]
                sig = tf.exp(tf.clip_by_value(logsig, -0.1, 0.1))
                dists.append((mu, sig))
                if z_inject is not None and z_inject[i] is not None:
                    z = z_inject[i]
                else:
                    assert mean, "oracle twin requires injected z or mean pass"
                    z = mu
                used.append(z)
                dec_in = tf.concat([z, features], axis=-1)
            else:
                dists.append(None)
                used.append(None)
                dec_in = features
            up = C[f"dec_hi_{i}"](dec_in)
            features = C[f"sersp_{i}"](tf.concat([up, skip[i]], axis=-1))
            if i < 3:
                ds_ops.append(features)
        return dict(dists=dists, used=used, features=features, ds_ops=ds_ops)

    def deep_sup_tail(self, C, ds_ops):
        """softmax(y1..y3) concat — the [..., nc:] tail of the reference's
        prob+ds y_softmax (networks.py:744-751)."""
        tf, L = self.tf, self.L
        s = [np.array(x) for x in self.strides]
        y1 = C["dsy1_logits"](L.UpSampling3D(size=tuple(s[1]))(ds_ops[-1]))
        y2 = C["dsy2_logits"](L.UpSampling3D(size=tuple(s[1] * s[2]))(ds_ops[-2]))
        y3 = C["dsy3_logits"](
            L.UpSampling3D(size=tuple(s[1] * s[2] * s[3]))(ds_ops[-3]))
        return tf.concat([tf.nn.softmax(t, axis=-1) for t in (y1, y2, y3)],
                         axis=-1)

    @staticmethod
    def kl_closed_form(tf, q, p):
        """KL(q||p) per voxel for diag Gaussians, summed over the latent dim
        — matches tfp MultivariateNormalDiag kl_divergence (networks.py:375)."""
        (mq, sq), (mp, sp) = q, p
        var_ratio = tf.square(sq / sp)
        t1 = tf.square((mq - mp) / sp)
        return tf.reduce_sum(
            0.5 * (var_ratio + t1 - 1.0) - tf.math.log(sq / sp), axis=-1)

    def forward(self, image, label, z_q, z_p):
        """The full five-pass prob graph (networks.py:348-391) with injected
        latents. z_q / z_p: per-level lists (None at zero-dim levels)."""
        tf = self.tf
        image = tf.constant(image)
        label = tf.constant(label)
        z_q = [None if z is None else tf.constant(z) for z in z_q]
        z_p = [None if z is None else tf.constant(z) for z in z_p]

        q_tr = self.trunk(self.posterior, tf.concat([image, label], axis=-1))
        q_sample = self.ladder(self.posterior, q_tr, z_inject=z_q)
        q_mean = self.ladder(self.posterior, q_tr, mean=True)

        p_tr = self.trunk(self.prior, image)
        p_sample = self.ladder(self.prior, p_tr, z_inject=z_p)
        p_zq = self.ladder(self.prior, p_tr, z_inject=q_sample["used"])
        p_zq_mean = self.ladder(self.prior, p_tr, z_inject=q_mean["used"])

        infer_conv = self.final_logits(p_sample["features"])
        train_conv = self.final_logits(p_zq_mean["features"])

        kl_total = tf.zeros((), tf.float32)
        for q, p in zip(q_sample["dists"], p_zq["dists"]):
            if q is None or p is None:
                continue
            kl_vox = self.kl_closed_form(tf, q, p)       # (B,D,H,W)
            kl_inst = tf.reduce_sum(kl_vox, axis=[1, 2, 3])
            kl_total += tf.reduce_mean(kl_inst)

        if self.deep_supervision:
            prob_softmax = tf.concat(
                [tf.nn.softmax(train_conv, axis=-1),
                 self.deep_sup_tail(self.prior, p_zq_mean["ds_ops"])], axis=-1)
        else:
            prob_softmax = tf.nn.softmax(train_conv, axis=-1)

        return dict(
            prob_train_conv=train_conv.numpy(),
            prob_infer_conv=infer_conv.numpy(),
            prob_kl=float(kl_total.numpy()),
            prob_softmax=prob_softmax.numpy(),
            infer_softmax=tf.nn.softmax(infer_conv, axis=-1).numpy(),
        )

    # ------------------------------------------------------------- weights io
    def weighted_layers(self):
        out = []
        for C in (self.prior, self.posterior):
            for v in C.values():
                if isinstance(v, self._SE):
                    out.extend(v.layers())
                elif hasattr(v, "weights"):
                    out.append(v)
        out.append(self.final_logits)
        return [l for l in out if getattr(l, "weights", None)]
