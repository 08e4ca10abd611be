"""SECOND encoder: sparse 3D conv backbone -> dense BEV.

Capability parity with reference models/heter_encoders.py:52-81 (SECOND =
MeanVFE -> VoxelBackBone8x -> HeightCompression) and
sub_modules/sparse_backbone_3d.py — built on the TPU-native COLUMN
engine in ops/column_conv.py instead of spconv: z dense, (y, x) sparse,
9 neighbor lookups + MXU GEMMs per conv (see that module's docstring;
numerically interchangeable with the voxel engine in ops/sparse_conv.py,
which tests/test_sparse_conv.py verifies).

Stage layout mirrors VoxelBackBone8x: 16 -> 32 -> 64 -> 64 channels with
three stride-2 sparse downsamples (8x spatial reduction), submanifold
convs inside each stage, then fold the remaining z layers into channels
(HeightCompression). Norm: per-voxel LayerNorm (stateless — vmappable
over the packed agent batch; stands in for the reference's BatchNorm1d).
Parameter names and (27, Cin, Cout) kernel shapes are shared with the
previous voxel-engine stack, so checkpoints load unchanged.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import column_conv as cc


class ColumnConvLayer(nn.Module):
    """One sparse conv (subm or strided) + LayerNorm + ReLU on columns.

    ``table`` carries the precomputed (O, 9) neighbor-column indices —
    built once per resolution level (cc.column_table / cc.strided_table)
    and shared by every conv at that level. Compute dtype follows the
    params' dtype (bf16-cast weights -> bf16 conv) except when
    ``precise_input`` keeps a raw-coordinate feature layer in f32.
    """

    cout: int
    strided: bool = False
    precise_input: bool = False

    @nn.compact
    def __call__(self, cols, grid, out=None, out_grid=None, table=None,
                 train: bool = False):
        cin = cols["feats"].shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(), (27, cin, self.cout)
        )
        kdt = jnp.asarray(w).dtype
        feats_in = cols["feats"]
        if kdt == jnp.bfloat16 and not self.precise_input:
            feats_in = feats_in.astype(kdt)
        cols = dict(cols, feats=feats_in)
        if self.strided:
            new_cols = cc.strided_conv(
                dict(cols, grid=grid), dict(out, grid=out_grid), w,
                table=table,
            )
            occ = new_cols["occ"]
        else:
            feats = cc.subm_conv(dict(cols, grid=grid), w, table=table)
            new_cols = dict(cols, feats=feats)
            occ = cols["occ"]
        h = nn.LayerNorm(epsilon=1e-3)(new_cols["feats"])
        if kdt == jnp.bfloat16:
            h = h.astype(kdt)
        new_cols["feats"] = nn.relu(h) * occ[..., None].astype(h.dtype)
        return new_cols


class SecondStack(nn.Module):
    """Per-sample column conv stack (vmapped over the agent batch)."""

    lidar_range: Sequence[float]
    voxel_size: Sequence[float]
    channels: Sequence[int]
    max_voxels: Sequence[int]
    presorted: bool = False
    # last level's submanifold convs CAN run densely (exact; see
    # _DenseSubmLayer + tests): the hypothesis was that replacing two
    # row-gather passes with dense conv wins, but at the bench L3 grid
    # ((5, 128, 256) x 64ch) the dense FLOPs (72 GFLOP/agent) cost MORE
    # than the gathers they replace (measured 23.3 vs 25.7 f/s on the
    # m3 single path) - default stays sparse; the flag remains for
    # smaller tails
    dense_tail: bool = False

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        # capacity is per-COLUMN here; active columns <= active voxels,
        # so the config's max_voxels bounds remain conservative-safe.
        cols = cc.voxelize_columns(
            points, mask, self.lidar_range, self.voxel_size,
            self.max_voxels[0], presorted=self.presorted,
        )
        grid = cols.pop("grid")
        # first layer consumes raw-coordinate mean features -> stays f32
        # even under bf16 serving (bf16 ULP at |x|~51 m is 0.25 m; a
        # bf16 local-offset + f32-center split was tried and REGRESSED:
        # TPU row-gather cost is per-index, so the extra 3-channel
        # side conv pays a second full gather pass for nothing)
        # one dense rank map per level feeds the level's subm table AND
        # the strided table into the next level
        dmap = cc.rank_map(dict(cols, grid=grid))
        table = cc.column_table(dict(cols, grid=grid), dmap=dmap)
        cols = ColumnConvLayer(
            self.channels[0], precise_input=True, name="conv_input"
        )(cols, grid, table=table, train=train)
        for si in range(1, len(self.channels)):
            out_cols = cc.downsample_columns(
                dict(cols, grid=grid), self.max_voxels[si]
            )
            out_grid = out_cols.pop("grid")
            st = cc.strided_table(
                dict(cols, grid=grid), out_cols, dmap=dmap
            )
            cols = ColumnConvLayer(
                self.channels[si], strided=True, name=f"down_{si}"
            )(cols, grid, out=out_cols, out_grid=out_grid, table=st,
              train=train)
            grid = out_grid
            if self.dense_tail and si == len(self.channels) - 1:
                dense, docc = cc.to_dense_voxels(dict(cols, grid=grid))
                for j in range(2):
                    dense = _DenseSubmLayer(
                        self.channels[si], name=f"stage{si}_subm{j}"
                    )(dense, docc, train)
                z, h, w = grid
                return dense.transpose(1, 2, 0, 3).reshape(
                    h, w, z * dense.shape[-1]
                )
            # the two submanifold convs of this stage share one table
            dmap = cc.rank_map(dict(cols, grid=grid))
            table = cc.column_table(dict(cols, grid=grid), dmap=dmap)
            for j in range(2):
                cols = ColumnConvLayer(
                    self.channels[si], name=f"stage{si}_subm{j}"
                )(cols, grid, table=table, train=train)
        return cc.to_dense_bev(dict(cols, grid=grid))


class _DenseSubmLayer(nn.Module):
    """Dense-canvas submanifold conv + LayerNorm + ReLU, parameter- and
    name-compatible with ColumnConvLayer (kernel (27, Cin, Cout),
    LayerNorm_0) so checkpoints load into either tail."""

    cout: int

    @nn.compact
    def __call__(self, dense, docc, train: bool = False):
        cin = dense.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(), (27, cin, self.cout)
        )
        kdt = jnp.asarray(w).dtype
        x = dense.astype(kdt) if kdt == jnp.bfloat16 else dense
        out = cc.dense_subm_conv(x, docc, w)
        h = nn.LayerNorm(epsilon=1e-3)(out)
        if kdt == jnp.bfloat16:
            h = h.astype(kdt)
        return nn.relu(h) * docc[..., None].astype(h.dtype)


class SecondEncoder(nn.Module):
    """points (B, N, 4) + mask -> BEV (B, ny/8, nx/8, nz/8 * C_last)."""

    voxel_size: Sequence[float]
    lidar_range: Sequence[float]
    channels: Sequence[int] = (16, 32, 64, 64)
    max_voxels: Sequence[int] = (24000, 16000, 12000, 8000)
    norm: str = "batch"  # accepted for interface parity; stack is LN
    presorted: bool = False
    dense_tail: bool = False

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        stack = nn.vmap(
            SecondStack,
            in_axes=(0, 0, None),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(
            lidar_range=tuple(self.lidar_range),
            voxel_size=tuple(self.voxel_size),
            channels=tuple(self.channels),
            max_voxels=tuple(self.max_voxels),
            presorted=self.presorted,
            dense_tail=self.dense_tail,
        )
        return stack(points, mask, train)


# ---------------------------------------------------------------------
# Reference-exact variant: VoxelBackBone8x mirrored layer-for-layer on
# the voxel-level oracle engine (ops/sparse_conv.py), BatchNorm'd like
# the reference (BatchNorm1d eps 1e-3). Exists to host transplanted
# reference SECOND checkpoints (utils/transplant.transplant_second_
# encoder) and to prove numeric parity vs the actual torch reference
# (tests/test_weight_transplant.py); the COLUMN engine above remains the
# fast serving path.
# Ref: models/heter_encoders.py:52-81 (SECOND = MeanVFE ->
# VoxelBackBone8x -> HeightCompression), sub_modules/sparse_backbone_3d
# .py:34-152, mean_vfe.py, height_compression.py.
class _OracleConvBN(nn.Module):
    """One sparse conv (subm / strided / anisotropic strided) + BN + ReLU."""

    cout: int
    taps: int = 27

    @nn.compact
    def __call__(self, feats, table, valid, train: bool = False):
        from ..ops import sparse_conv as sc
        from .encoders import MaskedBatchNorm

        cin = feats.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(), (self.taps, cin, self.cout)
        )
        out = sc.apply_table_conv(feats, table, w, valid)
        h = MaskedBatchNorm(name="bn")(out, valid, train)
        return nn.relu(h) * valid[:, None].astype(h.dtype)


class SecondRefStack(nn.Module):
    """Per-sample VoxelBackBone8x on the oracle engine (exact spconv
    site semantics; z grid padded +1 like the reference sparse_shape)."""

    lidar_range: Sequence[float]
    voxel_size: Sequence[float]
    max_voxels: Sequence[int] = (24000, 16000, 12000, 8000, 8000)
    num_features_out: int = 128

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        from ..ops import sparse_conv as sc

        sp = sc.voxelize_points(
            points, mask, self.lidar_range, self.voxel_size,
            self.max_voxels[0],
        )
        # ref sparse_shape = grid[::-1] + [1, 0, 0]: one extra z layer
        d, h, w = sp["grid"]
        sp = dict(sp, grid=(d + 1, h, w))

        t = sc.neighbor_table(sp)
        feats = _OracleConvBN(16, name="conv_input")(
            sp["feats"], t, sp["valid"], train
        )
        feats = _OracleConvBN(16, name="conv1_0")(feats, t, sp["valid"], train)
        sp = dict(sp, feats=feats)

        chans = {2: 32, 3: 64, 4: 64}
        for si in (2, 3, 4):
            pad = (0, 1, 1) if si == 4 else (1, 1, 1)
            out = sc.downsample_sites(
                sp, self.max_voxels[si - 1], padding=pad
            )
            st = sc.strided_table(sp, out, padding=pad)
            feats = _OracleConvBN(chans[si], name=f"conv{si}_0")(
                sp["feats"], st, out["valid"], train
            )
            sp = dict(out, feats=feats)
            t = sc.neighbor_table(sp)
            for j in (1, 2):
                feats = _OracleConvBN(chans[si], name=f"conv{si}_{j}")(
                    sp["feats"], t, sp["valid"], train
                )
                sp = dict(sp, feats=feats)

        # conv_out: kernel (3, 1, 1), stride (2, 1, 1), padding 0
        out = sc.downsample_sites_nd(
            sp, self.max_voxels[4], (3, 1, 1), (2, 1, 1), (0, 0, 0)
        )
        st = sc.strided_table_nd(sp, out, (3, 1, 1), (2, 1, 1), (0, 0, 0))
        feats = _OracleConvBN(self.num_features_out, taps=3, name="conv_out")(
            sp["feats"], st, out["valid"], train
        )
        sp = dict(out, feats=feats)

        # HeightCompression with the REFERENCE channel fold: dense
        # (C, D, H, W).view(C*D, H, W) -> NHWC channel index c*D + d
        dd, hh, ww = sp["grid"]
        c = feats.shape[-1]
        flat = (
            sp["coords"][:, 0] * (hh * ww)
            + sp["coords"][:, 1] * ww
            + sp["coords"][:, 2]
        )
        flat = jnp.where(sp["valid"], flat, dd * hh * ww)
        dense = jax.ops.segment_sum(
            feats * sp["valid"][:, None],
            flat,
            num_segments=dd * hh * ww + 1,
            indices_are_sorted=True,
        )[:-1].reshape(dd, hh, ww, c)
        return dense.transpose(1, 2, 3, 0).reshape(hh, ww, c * dd)


class SecondRefEncoder(nn.Module):
    """points (B, N, 4) + mask -> BEV, reference-exact layer stack."""

    voxel_size: Sequence[float]
    lidar_range: Sequence[float]
    max_voxels: Sequence[int] = (24000, 16000, 12000, 8000, 8000)
    num_features_out: int = 128

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        stack = nn.vmap(
            SecondRefStack,
            in_axes=(0, 0, None),
            out_axes=0,
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False},
        )(
            lidar_range=tuple(self.lidar_range),
            voxel_size=tuple(self.voxel_size),
            max_voxels=tuple(self.max_voxels),
            num_features_out=self.num_features_out,
        )
        return stack(points, mask, train)
