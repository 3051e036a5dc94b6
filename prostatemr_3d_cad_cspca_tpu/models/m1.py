"""M1 — top-level model API with the reference's constructor surface.

Parity target: class ``M1(LoadableModel)`` (reference networks.py:24-223) and
builder ``m1`` (networks.py:232-392). The README usage example
(reference README.md:30-62) maps 1:1:

    model = M1(input_spatial_dims=(20,160,160), input_channels=4, num_classes=2,
               filters=(32,64,128,256,512), strides=(...), kernel_sizes=(...),
               prob_latent_dims=(3,2,1,0), dropout_rate=0.5,
               dropout_mode='monte-carlo', se_reduction=(8,8,8,8,8),
               att_sub_samp=((1,1,1),(1,1,1),(1,1,1)), probabilistic=True,
               cascaded=False, deep_supervision=True)

JAX adaptation: ``M1`` is a thin stateful convenience wrapper over a pure
Flax module (``.net``) + param pytree (``.params``); every compute path is
also reachable functionally (``M1.net.apply``). Constructor args are captured
into ``self.config`` (reference ``@store_config_args``, modelio.py:20-55) and
serialized alongside the weights so ``M1.load(path)`` reconstructs the exact
architecture (modelio.py:98-117).

Initializer/regularizer kwargs accept the reference's semantics by name:
``kernel_initializer='orthogonal'``, ``bias_initializer='truncated_normal'``,
``kernel_regularizer=1e-5`` (L2 coefficient — folded into the training loss,
see ops.convolution.l2_penalty).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.convolution import ConvConfig
from .m1_net import M1CascadedNet, M1Net, decision_fusion

_INITIALIZERS = {
    "orthogonal": lambda: nn.initializers.orthogonal(scale=1.0),
    "truncated_normal": lambda: nn.initializers.truncated_normal(stddev=0.001),
    "zeros": lambda: nn.initializers.zeros,
    "glorot_uniform": lambda: nn.initializers.glorot_uniform(),
}


def _resolve_init(spec, default_name):
    if spec is None:
        return _INITIALIZERS[default_name]()
    if isinstance(spec, str):
        return _INITIALIZERS[spec]()
    return spec  # already a callable initializer


def _resolve_l2(spec, default=1e-4) -> float:
    if spec is None:
        return 0.0
    if isinstance(spec, (int, float)):
        return float(spec)
    return default


def _as_nested_tuple(x):
    if isinstance(x, (list, tuple)):
        return tuple(_as_nested_tuple(e) for e in x)
    return x


def m1(
    num_classes: int = 2,
    dropout_mode: str = "standard",
    dropout_rate: float = 0.50,
    filters=(32, 64, 128, 256, 512),
    strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (1, 2, 2)),
    kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    se_reduction=(8, 8, 8, 8, 8),
    att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
    kernel_initializer=None,
    bias_initializer=None,
    kernel_regularizer=1e-4,
    bias_regularizer=1e-4,
    dense_skip: bool = False,
    deep_supervision: bool = False,
    probabilistic: bool = False,
    prob_latent_dims=(1, 1, 1, 1),
    fused_prob_passes: bool = True,
    strict_reference_slicing: bool = False,
    remat: bool = False,
    act_store: Any = None,
    dtype: Any = None,
    **_ignored,
) -> M1Net:
    """Mid-level builder (reference networks.py:232-392).

    Returns the single-stage Flax module whose ``__call__(image, train)``
    yields the reference output dict (y_softmax / prob_softmax / prob_kl /
    prob_infer_conv / ...). The reference returned traced tensors; in JAX the
    module + params pytree is the equivalent artifact.
    """
    conv_cfg = ConvConfig(
        kernel_init=_resolve_init(kernel_initializer, "orthogonal"),
        bias_init=_resolve_init(bias_initializer, "truncated_normal"),
        kernel_l2=_resolve_l2(kernel_regularizer),
        bias_l2=_resolve_l2(bias_regularizer),
        dtype=dtype,
        act_store=act_store,
    )
    if len(_as_nested_tuple(prob_latent_dims)) == 3:
        # M1's ctor default is 3 entries (networks.py:53) while the core needs
        # 4 (res 3,2,1,0); the reference CLI always passes 4. Pad with 0.
        prob_latent_dims = tuple(prob_latent_dims) + (0,)
    return M1Net(
        num_classes=num_classes,
        dropout_mode=dropout_mode,
        dropout_rate=dropout_rate,
        filters=_as_nested_tuple(filters),
        strides=_as_nested_tuple(strides),
        kernel_sizes=_as_nested_tuple(kernel_sizes),
        se_reduction=_as_nested_tuple(se_reduction),
        att_sub_samp=_as_nested_tuple(att_sub_samp),
        conv_cfg=conv_cfg,
        dense_skip=dense_skip,
        deep_supervision=deep_supervision,
        probabilistic=probabilistic,
        prob_latent_dims=_as_nested_tuple(prob_latent_dims),
        fused_prob_passes=fused_prob_passes,
        strict_reference_slicing=strict_reference_slicing,
        remat=remat,
    )


class M1:
    """Top-level model with the reference's Keras-style surface
    (networks.py:24-223): constructor kwargs, ``get_detect_model``,
    ``decision_fusion``, ``compile``/``fit``/``predict``, ``save``/``load``.
    """

    def __init__(
        self,
        input_spatial_dims: Sequence[int],
        input_channels: int,
        num_classes: int,
        dropout_rate: float = 0.50,
        dropout_mode: str = "standard",
        filters=(32, 64, 128, 256, 512),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (1, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8),
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        kernel_initializer=None,
        bias_initializer=None,
        kernel_regularizer=1e-4,
        bias_regularizer=1e-4,
        cascaded=False,
        dense_skip: bool = False,
        deep_supervision: bool = False,
        probabilistic: bool = False,
        prob_latent_dims=(3, 2, 1),
        summary: bool = True,
        name: str = "UNET-TYPE-M1",
        # JAX-specific extras (safe defaults preserve reference behavior):
        fused_prob_passes: bool = True,
        strict_reference_slicing: bool = False,
        remat: bool = False,
        act_store: Any = None,
        dtype: Any = None,
        seed: int = 0,
        init_params: bool = True,
    ):
        ndims = len(input_spatial_dims)
        assert ndims in (1, 2, 3), f"ndims should be 1, 2 or 3. Found: {ndims}."

        # --- store_config_args parity (modelio.py:20-55): every ctor arg ----
        self.config: Dict[str, Any] = dict(
            input_spatial_dims=tuple(input_spatial_dims),
            input_channels=input_channels,
            num_classes=num_classes,
            dropout_rate=dropout_rate,
            dropout_mode=dropout_mode,
            filters=_as_nested_tuple(filters),
            strides=_as_nested_tuple(strides),
            kernel_sizes=_as_nested_tuple(kernel_sizes),
            se_reduction=_as_nested_tuple(se_reduction),
            att_sub_samp=_as_nested_tuple(att_sub_samp),
            kernel_initializer=kernel_initializer if isinstance(kernel_initializer, (str, type(None))) else "orthogonal",
            bias_initializer=bias_initializer if isinstance(bias_initializer, (str, type(None))) else "truncated_normal",
            kernel_regularizer=_resolve_l2(kernel_regularizer),
            bias_regularizer=_resolve_l2(bias_regularizer),
            cascaded=cascaded,
            dense_skip=dense_skip,
            deep_supervision=deep_supervision,
            probabilistic=probabilistic,
            prob_latent_dims=_as_nested_tuple(prob_latent_dims),
            summary=summary,
            name=name,
            fused_prob_passes=fused_prob_passes,
            strict_reference_slicing=strict_reference_slicing,
            remat=remat,
            # stored by canonical dtype NAME: keeps checkpoint configs
            # JSON-serializable and M1(**config) rebuildable
            act_store=np.dtype(act_store).name if act_store is not None else None,
            seed=seed,
        )
        self.name = name
        self.cascaded = cascaded
        self.probabilistic = probabilistic
        self.num_classes = num_classes
        self.input_spatial_dims = tuple(input_spatial_dims)
        self.input_channels = input_channels

        stage_kwargs = dict(
            dropout_mode=dropout_mode,
            dropout_rate=dropout_rate,
            filters=filters,
            strides=strides,
            kernel_sizes=kernel_sizes,
            se_reduction=se_reduction,
            att_sub_samp=att_sub_samp,
            kernel_initializer=kernel_initializer,
            bias_initializer=bias_initializer,
            kernel_regularizer=kernel_regularizer,
            bias_regularizer=bias_regularizer,
            dense_skip=dense_skip,
            deep_supervision=deep_supervision,
            probabilistic=probabilistic,
            prob_latent_dims=prob_latent_dims,
            fused_prob_passes=fused_prob_passes,
            strict_reference_slicing=strict_reference_slicing,
            remat=remat,
            act_store=act_store,
            dtype=dtype,
        )
        if cascaded:
            inner = m1(num_classes=num_classes, **stage_kwargs)
            self.net = M1CascadedNet(
                num_classes=num_classes,
                fusion=cascaded if isinstance(cascaded, str) else "identity",
                stage_kwargs={f.name: getattr(inner, f.name)
                              for f in inner.__dataclass_fields__.values()
                              if f.name != "num_classes"
                              and f.name != "parent" and f.name != "name"},
            )
        else:
            self.net = m1(num_classes=num_classes, **stage_kwargs)

        self.params = None
        self._compiled: Optional[Dict[str, Any]] = None
        self.opt_state = None
        if init_params:
            self.params = self.init(seed)
        if summary:
            self.summary()

    # ------------------------------------------------------------- functional
    def example_inputs(self, batch_size: int = 1) -> Any:
        shape = (batch_size, *self.input_spatial_dims, self.input_channels)
        x = jnp.zeros(shape, jnp.float32)
        return (x, x) if self.cascaded else x

    def init(self, seed: int = 0):
        # jit the whole init: flax's default eager init dispatches thousands
        # of tiny ops (catastrophic over a remote-device tunnel).
        init_fn = jax.jit(
            lambda rngs, x: self.net.init(rngs, x, train=False)["params"])
        rngs = {"params": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 1),
                "latent": jax.random.PRNGKey(seed + 2)}
        return init_fn(rngs, self.example_inputs())

    def _apply_fn(self, train: bool, with_rng: bool):
        key = (train, with_rng)
        cache = self.__dict__.setdefault("_apply_cache", {})
        if key not in cache:
            if with_rng:
                def fn(params, inputs, rng):
                    d, l = jax.random.split(rng)
                    return self.net.apply(
                        {"params": params}, inputs, train=train,
                        rngs={"dropout": d, "latent": l})
            else:
                def fn(params, inputs):
                    return self.net.apply({"params": params}, inputs, train=train)
            cache[key] = jax.jit(fn)
        return cache[key]

    def apply(self, params, inputs, train: bool = False, rng: Optional[jax.Array] = None):
        """Pure jitted forward. ``rng`` seeds dropout+latent streams when needed."""
        if rng is not None:
            return self._apply_fn(train, True)(params, inputs, rng)
        return self._apply_fn(train, False)(params, inputs)

    def __call__(self, inputs, train: bool = False, rng: Optional[jax.Array] = None):
        assert self.params is not None, "call .init() first or pass init_params=True"
        if rng is None and (self.probabilistic or self.config["dropout_mode"] == "monte-carlo" or train):
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        return self.apply(self.params, inputs, train=train, rng=rng)

    # ---------------------------------------------------------------- detect
    def get_detect_model(self) -> Callable:
        """Inference-only head (reference networks.py:196-206).

        Returns ``detect(params, inputs, rng=None)``:
          cascaded+prob -> (infer_softmax_1, infer_softmax_2)
          cascaded      -> (y_softmax_1[...,:nc], y_softmax_2[...,:nc])
          prob          -> infer_softmax   (fresh prior sample per call)
          deterministic -> y_softmax[...,:nc]
        """
        nc = self.num_classes

        def detect(params, inputs, rng: Optional[jax.Array] = None):
            out = self.apply(params, inputs, train=False, rng=rng)
            if self.cascaded:
                if self.probabilistic:
                    return out["infer_softmax_1"], out["infer_softmax_2"]
                return (out["stage1"]["y_softmax"][..., :nc],
                        out["stage2"]["y_softmax"][..., :nc])
            if self.probabilistic:
                return out["infer_softmax"]
            return out["y_softmax"][..., :nc]

        return detect

    decision_fusion = staticmethod(decision_fusion)

    def get_packed_forward(self) -> Callable:
        """TPU fast-path detect: the width-packed trunk (models/m1_packed.py,
        numerically equivalent — golden-tested in tests/test_m1_packed.py).
        Deterministic stand-alone models only; others fall back to the
        standard detect head.

        Returns ``fast(params, inputs) -> y_softmax[..., :num_classes]``.
        """
        # Fall back whenever the packed trunk cannot reproduce detect()'s
        # semantics — including always-on Monte-Carlo dropout (the CLI default,
        # cli.py:72): the packed trunk has no dropout, so routing an MC model
        # through it would silently return deterministic outputs.
        if self.cascaded or self.probabilistic or \
                (self.config["dropout_mode"] == "monte-carlo"
                 and self.config["dropout_rate"] > 0) or \
                any(tuple(a) != (1, 1, 1) for a in self.config["att_sub_samp"]):
            detect = self.get_detect_model()
            return lambda params, inputs: detect(params, inputs)
        from .m1_packed import PackedM1

        cfg = self.config
        fast = PackedM1(
            input_spatial_dims=tuple(self.input_spatial_dims),
            input_channels=self.input_channels,
            num_classes=self.num_classes,
            filters=tuple(cfg["filters"]),
            strides=tuple(tuple(s) for s in cfg["strides"]),
            kernel_sizes=tuple(tuple(k) for k in cfg["kernel_sizes"]),
            se_reduction=tuple(cfg["se_reduction"]),
            dense_skip=bool(cfg["dense_skip"]),
            deep_supervision=bool(cfg["deep_supervision"]),
            dtype=self.net.conv_cfg.dtype,
        )
        nc = self.num_classes
        # Pre-pack conv kernels once per parameter set (ADVICE r2): the pack
        # scatters run in their own small jit per param set, and the packed
        # kernels enter the jitted forward as plain device arrays. The
        # returned callable is already jitted — do not re-jit it (that would
        # move the packing back inside the trace).
        prep_cache: Dict[int, Any] = {}
        prep_jit = jax.jit(fast.prepare)
        fast_jit = jax.jit(
            lambda core, packed, x: fast(core, x, packed=packed)[..., :nc])

        def run(params, inputs):
            key = id(params)
            if key not in prep_cache:
                prep_cache.clear()
                prep_cache[key] = prep_jit(params["core"])
            return fast_jit(params["core"], prep_cache[key], inputs)

        return run

    # ----------------------------------------------------------- train surface
    def compile(self, optimizer=None, loss=None, loss_weights=None, **kwargs):
        """Record the training recipe (Keras-compile parity, train_model.py:231)."""
        self._compiled = dict(optimizer=optimizer, loss=loss,
                              loss_weights=loss_weights, **kwargs)
        return self

    def fit(self, *args, **kwargs):
        from ..train.trainer import fit as _fit

        assert self._compiled is not None, "compile() the model before fit()"
        return _fit(self, *args, **kwargs, **self._compiled)

    def predict(self, inputs, rng: Optional[jax.Array] = None):
        # Keras-surface parity: the reference's predict needs no explicit
        # RNG even for MC-dropout/probabilistic models (TF global RNG).
        # Self-key when the model is stochastic, like __call__ above;
        # pass ``rng`` for reproducible draws.
        if rng is None and (self.probabilistic
                            or self.config["dropout_mode"] == "monte-carlo"):
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        detect = self.get_detect_model()
        return detect(self.params, inputs, rng=rng)

    # ------------------------------------------------------------------- io
    def save(self, path: str):
        from ..utils.serialization import save_model

        save_model(path, self.config, self.params)

    def load_weights(self, path: str, strict: bool = False) -> "M1":
        """Load checkpoint weights INTO this model's architecture
        (reference ``model.load_weights`` warm-start, train_model.py:216-219).

        Leaves are matched by param-tree path; leaves absent from the
        checkpoint or with mismatched shapes (e.g. a different segmentation
        head or input-channel count) keep their freshly initialized values —
        exactly what makes freeze+finetune workflows coherent. ``strict=True``
        raises on any mismatch instead.
        """
        from ..utils.serialization import load_model

        if self.params is None:
            self.params = self.init(self.config.get("seed", 0))
        _, saved = load_model(path)
        flat_saved = {
            jax.tree_util.keystr(p): leaf
            for p, leaf in jax.tree_util.tree_flatten_with_path(saved)[0]}
        skipped = []

        def merge(path, leaf):
            key = jax.tree_util.keystr(path)
            got = flat_saved.pop(key, None)
            if got is not None and tuple(got.shape) == tuple(leaf.shape):
                return jnp.asarray(got, leaf.dtype)
            skipped.append(key)
            return leaf

        self.params = jax.tree_util.tree_map_with_path(merge, self.params)
        unused = sorted(flat_saved)
        if strict and (skipped or unused):
            raise ValueError(
                f"load_weights(strict=True): unmatched target leaves {skipped}, "
                f"unused checkpoint leaves {unused}")
        if skipped or unused:
            print(f"load_weights: kept init for {len(skipped)} leaves, "
                  f"ignored {len(unused)} checkpoint leaves (head/arch mismatch)")
        return self

    @classmethod
    def load(cls, path: str, **overrides) -> "M1":
        """Reconstruct architecture from the stored config, then load weights
        (reference modelio.py:98-117)."""
        from ..utils.serialization import load_model

        config, params = load_model(path)
        config = dict(config)
        config.update(overrides)
        config["summary"] = False
        config["init_params"] = False
        model = cls(**config)
        model.params = params
        return model

    # -------------------------------------------------------------- summary
    def describe(self, batch_size: int = 1, max_lines: int = 200):
        """Per-stage tensor-shape dump (reference M1Core.summary,
        networks.py:761-782, SHOW_SUMMARY flag). Uses jax.eval_shape over
        captured intermediates — no compute, no compile."""
        assert self.params is not None

        def fn(params, x):
            _, mods = self.net.apply(
                {"params": params}, x, train=False,
                capture_intermediates=True, mutable=["intermediates"])
            return mods["intermediates"]

        shapes = jax.eval_shape(fn, self.params, self.example_inputs(batch_size))
        lines = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
            name = "/".join(
                str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p))
                for p in path)
            if hasattr(leaf, "shape"):
                lines.append(f"{name:60s} {tuple(leaf.shape)}")
        for line in lines[:max_lines]:
            print(line)
        if len(lines) > max_lines:
            print(f"... ({len(lines) - max_lines} more)")
        return lines

    def summary(self):
        n_params = 0
        if self.params is not None:
            n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))
        kind = ("Cascaded " if self.cascaded else "") + (
            "Hierarchical Prob. 3D U-Net" if self.probabilistic else "Deterministic 3D U-Net")
        print("-" * 68)
        print(f"{kind} (Type: M1)  —  params: {n_params:,}")
        print(f"Input: {(self.input_spatial_dims)} x {self.input_channels}ch  "
              f"classes: {self.num_classes}")
        print("-" * 68)
