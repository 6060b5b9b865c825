"""Late-fusion two-branch network and the two-stage coarse→refine model.

radar_depth's additions over the sparse-to-dense skeleton (SURVEY.md §2 C7d/e,
§3.4):

* LateFusionNet — separate image (3ch) and radar (1ch) ResNet encoders, fused
  at the H/32 bottleneck (channel concat → 1×1 conv), shared decoder.
* MultiStageNet — stage-1 late-fusion net → coarse depth D₁; radar outlier
  filtering (drop radar returns whose depth disagrees with D₁ beyond a
  threshold — abs or relative, both [M] in the survey, so both supported);
  stage-2 late-fusion net on {rgb, filtered radar} → refined D₂. Returns
  (D₁, D₂). The filter is pure elementwise masking, so the full two-stage model
  compiles as a single XLA graph (BASELINE.json requirement).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from radar_depth_tpu.models.decoders import Decoder, tail_packed_enabled
from radar_depth_tpu.models.layers import (
    HeadConv3,
    make_norm,
    max_pool_torch,
    resize_bilinear_matmul,
)
from radar_depth_tpu.models.resnet import ResNetEncoder


class LateFusionNet(nn.Module):
    """Two-branch late fusion: f = concat(enc_img(rgb), enc_radar(radar)) at
    H/32; 1×1 conv halves to 256; shared decoder → depth.

    TPU stem fusion: the two branch stems are independent, so their conv
    outputs are BN/ReLU'd and CONCATENATED before one shared maxpool
    (128-channel pooling fills the VPU lanes a 64-channel pool wastes), then
    split back — exactly the same math, same parameter tree. MultiStageNet
    goes further and pools three stems at once by passing precomputed pooled
    stems via img_pooled/radar_pooled."""

    depth: int = 18
    decoder_kind: str = "upproj"
    output_size: tuple = (450, 800)
    radar_width: int = 64  # reference uses a full ResNet radar branch [M]
    radar_in_channels: int = 1  # 2 when the coarse map rides along (stage-2
    # of MultiStageNet(stage2_coarse=True); SURVEY.md §3.4 "(+D₁?)")
    fuse: str = "concat"  # concat | add
    norm: Callable = None
    dtype: Any = jnp.float32

    def setup(self):
        norm = self.norm or make_norm(dtype=self.dtype)
        self.img_encoder = ResNetEncoder(
            depth=self.depth, in_channels=3, norm=norm, dtype=self.dtype,
            name="img_encoder")
        self.radar_encoder = ResNetEncoder(
            depth=self.depth, in_channels=self.radar_in_channels,
            width=self.radar_width,
            norm=norm, dtype=self.dtype, name="radar_encoder")
        c = self.img_encoder.out_channels
        self.conv2 = nn.Conv(c // 2, (1, 1), use_bias=False, dtype=self.dtype,
                             precision=jax.lax.Precision.HIGHEST, name="conv2")
        self.bn2 = norm(name="bn2")
        self.decoder = Decoder(kind=self.decoder_kind, in_channels=c // 2,
                               norm=norm, dtype=self.dtype, name="decoder")
        self.conv3 = HeadConv3(dtype=self.dtype, name="conv3")

    def pooled_stems(self, rgb: jax.Array, radar: jax.Array, train: bool):
        """Both branch stems, pooled → (pi, pr). (A shared concatenated
        maxpool was measured: XLA materializes the concat instead of fusing
        it into the pool input, adding a full HBM round-trip — separate
        pools are faster on this backend.)"""
        yi = self.img_encoder.stem_finish(self.img_encoder.stem_conv(rgb),
                                          train)
        yr = self.radar_encoder.stem_finish(self.radar_encoder.stem_conv(radar),
                                            train)
        return max_pool_torch(yi, 3, 2, 1), max_pool_torch(yr, 3, 2, 1)

    def head(self, fi: jax.Array, fr: jax.Array, train: bool) -> jax.Array:
        """Fusion + bottleneck + decoder + 3×3 head + bilinear resize."""
        if self.fuse == "concat":
            y = jnp.concatenate([fi, fr], axis=-1)
        elif self.fuse == "add":
            y = fi + fr
        else:
            raise ValueError(self.fuse)
        y = self.conv2(y)
        y = self.bn2(y, use_running_average=not train)
        y = self.decoder(y, train)
        y = self.conv3(y, packed=tail_packed_enabled(self.decoder_kind))
        return resize_bilinear_matmul(y, *self.output_size).astype(jnp.float32)

    def __call__(self, rgb: jax.Array, radar: jax.Array, train: bool = False,
                 img_pooled=None, radar_pooled=None):
        if img_pooled is None and radar_pooled is None:
            img_pooled, radar_pooled = self.pooled_stems(rgb, radar, train)
        elif radar_pooled is None:
            yr = self.radar_encoder.stem_finish(
                self.radar_encoder.stem_conv(radar), train)
            radar_pooled = max_pool_torch(yr, 3, 2, 1)
        fi = self.img_encoder.body(img_pooled, train)
        fr = self.radar_encoder.body(radar_pooled, train)
        return self.head(fi, fr, train)


def filter_radar_by_prediction(
    radar: jax.Array,
    pred: jax.Array,
    abs_threshold: float = 2.0,
    rel_threshold: float = 0.15,
    mode: str = "abs",
) -> jax.Array:
    """Stage-1 → stage-2 radar outlier rejection (SURVEY.md §3.4 RADAR
    FILTERING, rule tagged [M]): keep radar pixel r only where
    |radar(r) − pred(r)| < τ (mode="abs"), or < τ_rel·pred(r) (mode="rel"),
    or either (mode="or"). Zero (=no return) pixels stay zero."""
    err = jnp.abs(radar - pred)
    keep_abs = err < abs_threshold
    keep_rel = err < rel_threshold * jnp.maximum(pred, 1e-3)
    if mode == "abs":
        keep = keep_abs
    elif mode == "rel":
        keep = keep_rel
    elif mode == "or":
        keep = keep_abs | keep_rel
    else:
        raise ValueError(mode)
    return jnp.where((radar > 0) & keep, radar, 0.0)


def blend_by_brightness(
    coarse: jax.Array,
    refined: jax.Array,
    rgb: jax.Array,
    tau: float,
) -> jax.Array:
    """Brightness-conditional output policy over the two heads the
    multistage graph already computes (SURVEY.md §3.4 two-stage output
    semantics [M]): per sample, emit ``refined`` where the image is dark
    (mean RGB < tau — radar carries unique signal) and ``coarse`` where
    bright (the image branch alone is sufficient; refinement pays a
    measured severity-independent ~+1.4% day-RMSE tax, NOTES.md r4
    Phase B). Pure elementwise select — one graph, no extra FLOPs.
    Measured r5 (results/r5/blend_*.txt): any tau in [0.10, 0.40]
    separates synthetic day/night exactly, making the blend the best of
    both heads on every split."""
    bright = jnp.mean(rgb.astype(jnp.float32), axis=(1, 2, 3))
    dark = (bright < tau)[:, None, None, None]
    return jnp.where(dark, refined, coarse)


class MultiStageNet(nn.Module):
    """Two-stage coarse→refine model (upstream multistage arch; SURVEY.md
    §3.4). Single jitted graph; returns (coarse, refined)."""

    depth: int = 18
    decoder_kind: str = "upproj"
    output_size: tuple = (450, 800)
    filter_mode: str = "abs"
    abs_threshold: float = 2.0
    rel_threshold: float = 0.15
    norm: Callable = None
    dtype: Any = jnp.float32
    # Rematerialize each stage in the backward pass (jax.checkpoint): trades
    # ~one extra forward for not storing both stages' activations — enables
    # larger train batches on a 16 GB chip (SURVEY.md: "use jax.checkpoint /
    # rematerialisation to trade FLOPs for memory").
    remat: bool = False
    # SPECULATIVE (SURVEY.md §2 C7 registry note, [M]): the reference may ship
    # `*_multistage_uncertainty*` archs. This variant learns per-stage
    # homoscedastic log-variances s_i and weights the multistage loss as
    # Σ exp(−s_i)·ℓ_i + s_i (Kendall et al. 2018). Gated behind the
    # `--multistage-uncertainty` flag / `*_uncertainty` registry names until
    # the reference is readable.
    uncertainty: bool = False
    # SURVEY.md §3.4 tags stage-2's input as "{rgb, filtered radar (+D₁?)}"
    # [M]: with stage2_coarse=True the coarse prediction rides as a second
    # radar-branch channel (stop_gradient'ed, like the filter input, so
    # stage-1 stays independently supervised — the coarse==matched-budget-
    # latefusion property of the r3 ablation is preserved). Stage-2's radar
    # conv1 widens to 2 input channels; --stage1-path grafting zero-pads the
    # new channel so the initialized stage-2 computes exactly what a 1-ch
    # graft would (train/loop.py::maybe_init_from_stage1).
    stage2_coarse: bool = False

    @nn.compact
    def __call__(self, rgb: jax.Array, radar: jax.Array, train: bool = False):
        kwargs = dict(
            depth=self.depth, decoder_kind=self.decoder_kind,
            output_size=self.output_size, norm=self.norm, dtype=self.dtype,
        )
        stage_cls = (
            nn.remat(LateFusionNet, static_argnums=(3,)) if self.remat
            else LateFusionNet
        )
        stage1 = stage_cls(**kwargs, name="stage1")
        stage2 = stage_cls(
            **kwargs, radar_in_channels=2 if self.stage2_coarse else 1,
            name="stage2")
        if self.remat:
            coarse = stage1(rgb, radar, train)
        else:
            # Cross-stage stem fusion (exact reassociation, same params):
            # stage2's IMAGE branch depends only on rgb, so its stem runs
            # with stage1's — both stages' img conv1 kernels concatenate
            # into ONE N=128 conv over the shared rgb input (full MXU
            # lanes). Pools stay separate (a shared 192-channel pool was
            # measured slower: XLA materializes the concat).
            k1 = stage1.img_encoder.conv1.kernel
            k2 = stage2.img_encoder.conv1.kernel
            kcat = jnp.concatenate([k1, k2], axis=-1)
            yi = jax.lax.conv_general_dilated(
                rgb.astype(self.dtype), kcat.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)
            w1 = k1.shape[-1]
            p1i = max_pool_torch(
                stage1.img_encoder.stem_finish(yi[..., :w1], train), 3, 2, 1)
            p2i = max_pool_torch(
                stage2.img_encoder.stem_finish(yi[..., w1:], train), 3, 2, 1)
            p1r = max_pool_torch(stage1.radar_encoder.stem_finish(
                stage1.radar_encoder.stem_conv(radar), train), 3, 2, 1)
            coarse = stage1(rgb, radar, train, p1i, p1r)
        coarse_sg = jax.lax.stop_gradient(coarse)
        filtered = filter_radar_by_prediction(
            radar,
            coarse_sg,
            abs_threshold=self.abs_threshold,
            rel_threshold=self.rel_threshold,
            mode=self.filter_mode,
        )
        if self.stage2_coarse:
            stage2_radar = jnp.concatenate([filtered, coarse_sg], axis=-1)
        else:
            stage2_radar = filtered
        if self.remat:
            refined = stage2(rgb, stage2_radar, train)
        else:
            refined = stage2(rgb, stage2_radar, train, p2i, None)
        if self.uncertainty:
            log_var = self.param("stage_log_var",
                                 nn.initializers.zeros_init(), (2,),
                                 jnp.float32)
            return coarse, refined, log_var
        return coarse, refined
