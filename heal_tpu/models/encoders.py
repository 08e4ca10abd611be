"""Per-agent sensor encoders (lidar → BEV).

Reference: models/heter_encoders.py — PointPillar (:22-50), SECOND (:52-81),
LiftSplatShoot (:83-242). Encoders take padded per-agent sensor data and
produce a dense NHWC BEV feature map; all shapes static.

The PointPillars path fuses voxelize+VFE+scatter (see ops/voxelize.py):
one big (B*N_pts, C) GEMM for the PFN feeds segment-max scatters — no
ragged pillar tensors, MXU-friendly, voxelization on device.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import voxelize
from .layers import Norm


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid points only (padding excluded from statistics).

    Mirrors BatchNorm1d(eps=1e-3, momentum=0.01) in the reference PFNLayer
    but is padding-aware — required because our point tensors are padded to
    a fixed N.
    """

    momentum: float | None = None  # None -> layers default (see layers.Norm)
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            w = mask.astype(jnp.float32)
            denom = jnp.maximum(w.sum(), 1.0)
            mean = (x * w[:, None]).sum(0) / denom
            var = (((x - mean) ** 2) * w[:, None]).sum(0) / denom
            if not self.is_initializing():
                from .layers import DEFAULT_BN_MOMENTUM

                m = (self.momentum if self.momentum is not None
                     else DEFAULT_BN_MOMENTUM)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class PFNLayer(nn.Module):
    """Linear -> norm -> relu per point (max-pooling happens at scatter)."""

    features: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        from .layers import parse_norm

        kind, momentum = parse_norm(self.norm)
        x = nn.Dense(self.features, use_bias=kind == "none")(x)
        if kind == "batch":
            x = MaskedBatchNorm(momentum=momentum)(x, mask, train)
        elif kind == "group":
            x = nn.LayerNorm(epsilon=1e-3)(x)
        return nn.relu(x)


class PointPillarEncoder(nn.Module):
    """points (B, N, 4) + mask (B, N) -> BEV (B, ny, nx, C).

    Args mirror the reference encoder_args: voxel_size, lidar_range,
    pillar_vfe.num_filters / use_absolute_xyz / with_distance,
    point_pillar_scatter.num_features.
    """

    voxel_size: Sequence[float]
    lidar_range: Sequence[float]
    num_filters: Sequence[int] = (64,)
    use_absolute_xyz: bool = True
    with_distance: bool = False
    norm: str = "batch"
    # points already host-ordered by pillar id per sample (the assembler's
    # _presort contract, data/scene.py) -> skip the device argsort, which
    # costs more than the entire conv stack at 150k points on a v5e
    presorted: bool = False
    # eval-mode TPU serving uses the fused Pallas segmented-reduce kernel
    # (ops/pallas_pillar.py) instead of XLA segment ops: one streaming
    # pass over the sorted points replaces the two ~2 ms scatters
    pallas_scatter: bool = True

    @property
    def grid_nx(self):
        return int(
            round((self.lidar_range[3] - self.lidar_range[0]) / self.voxel_size[0])
        )

    @property
    def grid_ny(self):
        return int(
            round((self.lidar_range[4] - self.lidar_range[1]) / self.voxel_size[1])
        )

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        b, n, _ = points.shape
        nx, ny = self.grid_nx, self.grid_ny
        cells = nx * ny + 1  # + drop bucket

        # per-sample pillar ids, flattened into a batch-wide segment space
        ids, valid = jax.vmap(
            lambda p, m: voxelize.pillar_ids(
                p, m, self.lidar_range, self.voxel_size, nx, ny
            )
        )(points, mask)
        flat_ids = (
            ids + jnp.arange(b, dtype=ids.dtype)[:, None] * cells
        ).reshape(-1)
        flat_valid = valid.reshape(-1)
        flat_points = points.reshape(-1, points.shape[-1])

        # sort points by pillar id: XLA's TPU scatter is ~70x faster with
        # sorted indices (measured 27ms -> 0.4ms per segment op on v5e),
        # and the per-sample offsets keep the batch grouping intact.
        # presorted: per-sample host ordering + increasing per-sample
        # offsets => the flat concatenation is already globally sorted.
        if not self.presorted:
            order = jnp.argsort(flat_ids)
            flat_ids = flat_ids[order]
            flat_valid = flat_valid[order]
            flat_points = jnp.take(flat_points, order, axis=0)
        else:
            # safety net for host/device rounding disagreement at bin
            # edges: a running max guarantees the monotone-ids contract
            # of indices_are_sorted (a violation silently corrupts the
            # whole scatter); a rare straggler point merges into the
            # previous pillar instead — bounded, local error
            flat_ids = jax.lax.associative_scan(jnp.maximum, flat_ids)

        if (
            len(self.num_filters) == 1
            and self.norm.split("@")[0] == "batch"
            and self.use_absolute_xyz
            and not self.with_distance
        ):
            # gather-free fused path (the standard PointPillars config)
            return self._fused(flat_points, flat_ids, flat_valid, b, train)

        feats = self._decorate(flat_points, flat_ids, flat_valid, b * cells)
        for i, f in enumerate(self.num_filters):
            feats = PFNLayer(f, norm=self.norm, name=f"pfn_{i}")(
                feats, flat_valid, train
            )
        feats = feats * flat_valid.astype(feats.dtype)[:, None]

        canvas = jax.ops.segment_max(
            feats, flat_ids, num_segments=b * cells, indices_are_sorted=True
        )
        canvas = jnp.maximum(
            jnp.where(jnp.isfinite(canvas), canvas, 0.0), 0.0
        )
        canvas = canvas.reshape(b, cells, -1)[:, : nx * ny]
        return canvas.reshape(b, ny, nx, -1)

    def _fused(self, fp, fi, fv, b, train):
        """Gather-free decorate+PFN+BN+scatter.

        The PFN is linear and BatchNorm is per-channel affine, so the
        decorated features' pillar-constant parts (cluster mean, pillar
        center) can be folded into a PER-PILLAR additive term computed on
        the segment table — the per-point mean[ids] gather of the naive
        formulation (measured ~8 ms of the 13 ms encoder on v5e) never
        happens. ReLU and max commute (both monotone), so
        max_i relu(a_i + t_p) = relu(max_i a_i + t_p):
            canvas_p = relu( segment_max(s.(p_i @ A)) + s.t_p + b )
        Batch statistics in train mode use the same algebra
        (E[y], E[y^2] decompose into point sums + cnt-weighted table sums).
        """
        nx, ny = self.grid_nx, self.grid_ny
        cells = nx * ny + 1
        f = self.num_filters[0]
        s_total = b * cells

        kernel = self.param(
            "pfn_kernel", nn.initializers.lecun_normal(), (10, f)
        )
        scale = self.param("bn_scale", nn.initializers.ones, (f,))
        bias = self.param("bn_bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable(
            "batch_stats", "bn_mean", lambda: jnp.zeros(f, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "bn_var", lambda: jnp.ones(f, jnp.float32)
        )

        # Compute dtype for the per-point GEMM + segment ops follows the
        # PARAMS' dtype (bf16-cast weights -> bf16 serving), never the
        # points': points must stay f32 so pillar binning matches the
        # host presort, but absolute coords never enter the point GEMM —
        # only pillar-LOCAL offsets (<= half a voxel, bf16 ULP ~2e-3 m
        # there) and intensity. The absolute-coordinate contribution is
        # constant per pillar and rides the f32 table term below, so the
        # features equal the f32 formulation up to small-value rounding.
        kdt = jnp.asarray(kernel).dtype
        cdt = kdt if kdt == jnp.bfloat16 else fp.dtype
        w = fv.astype(cdt)[:, None]

        # jnp.asarray: checkpoint-loaded params arrive as numpy arrays,
        # which lack the .at updater used below
        k32 = jnp.asarray(kernel, jnp.float32)
        w_raw, w_mu, w_c = k32[:4], k32[4:7], k32[7:10]
        # decorated = [p, p_xyz - mean, p_xyz - center]: fold the xyz
        # weights together; rows 0-2 apply to LOCAL xyz, the center part
        # moves to the pillar table (raw = center + local)
        a_mat = w_raw.at[:3].add(w_mu + w_c)  # (4, F)

        # pillar centers straight from the table index (no per-point work)
        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.lidar_range[:3]

        def centers_of(cell_ids):
            xi = (cell_ids % nx).astype(jnp.float32)
            yi = (cell_ids // nx).astype(jnp.float32)
            return jnp.stack(
                [
                    xi * vx + (x0 + vx / 2),
                    yi * vy + (y0 + vy / 2),
                    jnp.full_like(xi, z0 + vz / 2),
                ],
                axis=-1,
            )

        local = ((fp[:, :3] - centers_of(fi % cells)).astype(cdt)) * w
        pfeat = jnp.concatenate(
            [local, fp[:, 3:4].astype(cdt) * w], axis=-1
        )  # (N, 4) bf16-safe small values

        import os

        force = os.environ.get("HEAL_TPU_FORCE_PALLAS") == "1"
        if (
            not train
            and self.pallas_scatter
            and (jax.default_backend() == "tpu" or force)
        ):
            mu, var = ra_mean.value, ra_var.value
            s_aff = scale.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-3)
            b_aff = bias.astype(jnp.float32) - s_aff * mu
            return self._pallas_eval(
                fi, local, pfeat, w, a_mat, w_mu, w_raw, s_aff, b_aff,
                b, cdt,
            )

        center = centers_of(jnp.arange(s_total, dtype=jnp.int32) % cells)
        a_pt = pfeat @ a_mat.astype(cdt)  # (N, F), invalid -> 0

        # mean term via a WIDE segment_sum: XLA's TPU scatter is ~4x
        # slower for narrow (<64-lane) operands, so instead of summing
        # (xyz, 1) per pillar we sum the already-projected per-point
        # contribution local_xyz @ Wmu (F channels) + a count channel:
        #   mean @ Wmu = center @ Wmu + (seg_sum(local)/cnt) @ Wmu
        g = jnp.concatenate(
            [local @ w_mu.astype(cdt), w], axis=-1
        )  # (N, F+1)
        seg = jax.ops.segment_sum(
            g, fi, num_segments=s_total, indices_are_sorted=True
        ).astype(jnp.float32)
        cnt = seg[:, f : f + 1]
        # y_i = local_i @ a_mat + int_i @ w_int + t_p with
        # t_p = center @ Wraw_xyz - (local mean @ Wmu)
        # (= the old raw-coordinate t_tab shifted by center @ a_mat[:3])
        t_tab = (
            -seg[:, :f] / jnp.maximum(cnt, 1.0)
            + center @ w_raw[:3]
        )  # (S, F) f32

        if train:
            n_valid = jnp.maximum(w.astype(jnp.float32).sum(), 1.0)
            a32 = a_pt.astype(jnp.float32)
            sum_a = a32.sum(0)  # invalid rows already zero
            seg_a = jax.ops.segment_sum(
                a_pt, fi, num_segments=s_total, indices_are_sorted=True
            ).astype(jnp.float32)
            mean_y = (sum_a + (cnt * t_tab).sum(0)) / n_valid
            e2 = (
                (a32**2).sum(0)
                + 2.0 * (seg_a * t_tab).sum(0)
                + (cnt * t_tab**2).sum(0)
            ) / n_valid
            var_y = jnp.maximum(e2 - mean_y**2, 0.0)
            if not self.is_initializing():
                from .layers import DEFAULT_BN_MOMENTUM, parse_norm

                m = parse_norm(self.norm)[1]  # MaskedBatchNorm momentum
                if m is None:
                    m = DEFAULT_BN_MOMENTUM
                ra_mean.value = m * ra_mean.value + (1 - m) * mean_y
                ra_var.value = m * ra_var.value + (1 - m) * var_y
            mu, var = mean_y, var_y
        else:
            mu, var = ra_mean.value, ra_var.value

        s_aff = scale.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-3)
        b_aff = bias.astype(jnp.float32) - s_aff * mu

        u = a_pt * s_aff.astype(a_pt.dtype)  # per point
        tb = (t_tab * s_aff + b_aff).astype(a_pt.dtype)  # per pillar
        m_seg = jax.ops.segment_max(
            u, fi, num_segments=s_total, indices_are_sorted=True
        )
        canvas = jnp.where(
            jnp.isfinite(m_seg), jnp.maximum(m_seg + tb, 0.0), 0.0
        )
        canvas = canvas.reshape(b, cells, -1)[:, : nx * ny]
        return canvas.reshape(b, ny, nx, -1)

    def _pallas_eval(
        self, fi, local, pfeat, w, a_mat, w_mu, w_raw, s_aff, b_aff, b, cdt
    ):
        """Eval-mode fused path on the Pallas segmented-reduce kernel.

        Same math as the XLA fused path below (the BN affine is folded
        into the per-point GEMM and the per-run epilogue inside the
        kernel); sums accumulate in f32 instead of the segment op's
        operand dtype, otherwise equal up to f32 rounding.
        """
        from ..ops import pallas_pillar as pp

        nx, ny = self.grid_nx, self.grid_ny
        cells = nx * ny + 1  # table-space per-sample stride (drop bucket)
        stride = nx * ny  # canvas-space per-sample stride (no bucket)
        f = self.num_filters[0]
        s_total = b * cells
        n = fi.shape[0]
        pb = pp.P_BLOCK
        npad = -n % pb
        if npad:
            # pad points join a sentinel run whose cell is out of bounds
            fi = jnp.concatenate(
                [fi, jnp.full((npad,), s_total, fi.dtype)]
            )
            pfeat = jnp.pad(pfeat, ((0, npad), (0, 0)))
            local = jnp.pad(local, ((0, npad), (0, 0)))
            w = jnp.pad(w, ((0, npad), (0, 0)))

        # BN scale folded into the point GEMM (sign-safe: applied per
        # point, before the max)
        a2 = (jnp.asarray(a_mat, jnp.float32) * s_aff).astype(cdt)
        u = pfeat @ a2  # (Np, F)
        g4 = jnp.concatenate(
            [local.astype(jnp.float32), w.astype(jnp.float32)], axis=-1
        )  # (Np, 4): w-weighted local xyz + count

        prev = jnp.concatenate([fi[:1] - 1, fi[:-1]])
        cidx = jnp.cumsum((fi != prev).astype(jnp.int32)) - 1
        nxt = jnp.concatenate([fi[1:], fi[-1:] + 1])
        ends = (fi != nxt).astype(jnp.int32)

        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.lidar_range[:3]
        geom = jnp.zeros((f,), jnp.float32).at[:8].set(
            jnp.asarray(
                [vx, vy, x0 + vx / 2, y0 + vy / 2, z0 + vz / 2,
                 float(nx), float(stride), 0.0],
                jnp.float32,
            )
        )
        consts = jnp.concatenate(
            [
                jnp.asarray(w_mu, jnp.float32) * s_aff,  # W1 (3, F)
                jnp.asarray(w_raw[:3], jnp.float32) * s_aff,  # W2 (3, F)
                b_aff[None, :],
                geom[None, :],
            ],
            axis=0,
        )  # (8, F)

        # cells handed to the kernel are CANVAS-space (samp * ny*nx + id,
        # i.e. table id minus one drop slot per preceding sample); the
        # kernel suppresses drop-bucket runs, so no bucket exists in the
        # canvas and the reshape below is free (the old table-space
        # layout needed a [:, :ny*nx] slice = an 80+ MB canvas copy)
        samp = fi // cells
        vals, cells_tab = pp.pillar_tables(
            u,
            g4,
            cidx,
            ends,
            (fi - samp).astype(jnp.float32),
            samp.astype(jnp.float32),
            consts,
            # interpreter off-TPU (testing via HEAL_TPU_FORCE_PALLAS)
            interpret=jax.default_backend() != "tpu",
        )
        # cells are monotone; gap rows repeat the previous run's cell
        # with a ZERO payload, so the expand is a SORTED scatter-ADD
        # (duplicates contribute nothing)
        canvas = jnp.zeros((b * stride, f), u.dtype).at[
            cells_tab[:, 0]
        ].add(vals.astype(u.dtype), indices_are_sorted=True, mode="drop")
        return canvas.reshape(b, ny, nx, -1)

    def _decorate(self, pts, ids, valid, num_segments):
        """PillarVFE 10-channel decoration over the flattened batch."""
        w = valid.astype(pts.dtype)[:, None]
        xyzw = jnp.concatenate([pts[:, :3] * w, w], axis=-1)
        seg = jax.ops.segment_sum(
            xyzw, ids, num_segments=num_segments, indices_are_sorted=True
        )
        mean = seg[:, :3] / jnp.maximum(seg[:, 3:4], 1.0)
        f_cluster = pts[:, :3] - jnp.take(mean, ids, axis=0)

        nx = self.grid_nx
        cells = nx * self.grid_ny + 1
        cell_id = ids % cells
        xi = cell_id % nx
        yi = cell_id // nx
        vx, vy, vz = self.voxel_size
        cx = xi.astype(pts.dtype) * vx + (self.lidar_range[0] + vx / 2)
        cy = yi.astype(pts.dtype) * vy + (self.lidar_range[1] + vy / 2)
        cz = jnp.full_like(cx, self.lidar_range[2] + vz / 2)
        f_center = pts[:, :3] - jnp.stack([cx, cy, cz], axis=-1)

        feats = [pts if self.use_absolute_xyz else pts[:, 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(pts[:, :3], axis=-1, keepdims=True))
        return jnp.concatenate(feats, axis=-1) * w
