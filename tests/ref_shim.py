"""Import shim for the PyTorch reference at /root/reference.

Differential parity tests import reference modules directly (CPU torch is
installed) and A/B them against heal_tpu on random inputs. A few of the
reference's third-party imports are absent in this environment; this shim
installs minimal substitutes BEFORE the opencood import so the reference
code runs unmodified:

* ``icecream.ic`` — debug printer; no-op.
* ``pyquaternion.Quaternion`` — used only on nuScenes-format paths our
  contracts never touch; raising placeholder.
* ``shapely.geometry.Polygon`` — the reference's polygon-IoU kernel.
  NOT a no-op: a real convex-polygon implementation (Sutherland-Hodgman
  clip + shoelace area) so the reference's compute_iou/nms_rotated logic
  genuinely executes and can be A/B'd against our line-integral
  rotated-IoU. (BEV boxes are convex, so convex-only clipping is exact.)
* ``opencood.utils.box_overlaps`` — the reference's Cython extension
  (uncompiled here); replaced by a numpy reimplementation of the classic
  Fast R-CNN overlaps kernel with identical semantics.
* ``open3d`` / ``opencood.visualization.vis_utils`` dependencies are
  avoided by stubbing open3d (imported transitively, never called).

The reference tree is imported read-only: bytecode writing is disabled so
no __pycache__ lands in /root/reference.
"""
from __future__ import annotations

import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------- shapely
class _ShimPolygon:
    """Convex polygon with the tiny slice of the shapely API the
    reference uses: .area, .buffer(0), .intersection(p).area, .union."""

    def __init__(self, coords):
        pts = np.asarray(coords, dtype=np.float64)
        if len(pts) and np.allclose(pts[0], pts[-1]):
            pts = pts[:-1]
        self._pts = pts

    # shoelace (signed -> abs)
    @property
    def area(self) -> float:
        p = self._pts
        if len(p) < 3:
            return 0.0
        x, y = p[:, 0], p[:, 1]
        return float(
            abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2
        )

    def buffer(self, _dist):
        return self

    @property
    def is_valid(self) -> bool:
        return len(self._pts) >= 3

    def _ccw(self):
        p = self._pts
        x, y = p[:, 0], p[:, 1]
        signed = np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
        return p if signed >= 0 else p[::-1]

    def intersection(self, other: "_ShimPolygon") -> "_ShimPolygon":
        # Sutherland–Hodgman: clip self by each edge of (convex) other
        subject = self._ccw()
        clip = other._ccw()
        out = list(subject)
        n = len(clip)
        for i in range(n):
            if not out:
                break
            a, b = clip[i], clip[(i + 1) % n]
            edge = np.array([b[0] - a[0], b[1] - a[1]])
            inp, out = out, []
            for j in range(len(inp)):
                cur, nxt = inp[j], inp[(j + 1) % len(inp)]
                cur_in = np.cross(edge, cur - a) >= 0
                nxt_in = np.cross(edge, nxt - a) >= 0
                if cur_in:
                    out.append(cur)
                if cur_in != nxt_in:
                    d = nxt - cur
                    denom = np.cross(edge, d)
                    if abs(denom) > 1e-12:
                        t = np.cross(edge, a - cur) / -denom
                        out.append(cur + t * d)
        return _ShimPolygon(np.asarray(out).reshape(-1, 2))

    def union(self, other: "_ShimPolygon"):
        # only .area is consumed; |A ∪ B| = |A| + |B| - |A ∩ B|
        class _Area:
            def __init__(self, a):
                self.area = a

        return _Area(
            self.area + other.area - self.intersection(other).area
        )


# -------------------------------------------------------- numpy overlaps
def _bbox_overlaps(boxes, query_boxes):
    """Fast R-CNN style overlaps (the +1 pixel convention of the
    reference's Cython kernel, utils/box_overlaps.pyx)."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    query = np.ascontiguousarray(query_boxes, dtype=np.float64)
    n, k = boxes.shape[0], query.shape[0]
    overlaps = np.zeros((n, k), dtype=np.float64)
    for kk in range(k):
        qarea = (query[kk, 2] - query[kk, 0] + 1) * (
            query[kk, 3] - query[kk, 1] + 1
        )
        for nn in range(n):
            iw = (
                min(boxes[nn, 2], query[kk, 2])
                - max(boxes[nn, 0], query[kk, 0])
                + 1
            )
            if iw <= 0:
                continue
            ih = (
                min(boxes[nn, 3], query[kk, 3])
                - max(boxes[nn, 1], query[kk, 1])
                + 1
            )
            if ih <= 0:
                continue
            ua = (
                (boxes[nn, 2] - boxes[nn, 0] + 1)
                * (boxes[nn, 3] - boxes[nn, 1] + 1)
                + qarea
                - iw * ih
            )
            overlaps[nn, kk] = iw * ih / ua
    return overlaps


# ---------------------------------------------------------------- spconv
# A REAL pure-torch implementation of the spconv API slice the reference's
# VoxelBackBone8x uses (sparse_backbone_3d.py) — grids in the parity tests
# are small, so sparse conv is computed exactly via densify -> F.conv3d ->
# resample, with spconv's exact output-site rules:
#   * SubMConv3d: outputs only at input sites, centered stencil
#     (padding has no effect on site selection);
#   * SparseConv3d: output site o is active iff any input voxel lies in
#     its receptive field [stride*o - padding, ... + kernel - 1].
# Weight layout follows spconv 1.2.1 ((kd, kh, kw, in, out)) — the layout
# of the published HEAL checkpoints.
def _t3(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


class _ShimSparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size):
        self.features = features  # (V, C)
        self.indices = indices  # (V, 4) [b, z, y, x]
        self.spatial_shape = list(int(s) for s in spatial_shape)
        self.batch_size = int(batch_size)

    def dense(self):
        import torch

        d, h, w = self.spatial_shape
        c = self.features.shape[1]
        out = torch.zeros(
            self.batch_size, c, d, h, w, dtype=self.features.dtype
        )
        idx = self.indices.long()
        out[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]] = self.features
        return out


class _ShimSparseConvBase:
    """Common torch-Module machinery for the two conv kinds."""

    def _init(self, in_ch, out_ch, kernel, stride, padding, bias):
        import torch

        assert not bias, "reference backbone uses bias=False throughout"
        self.kernel = _t3(kernel)
        self.stride = _t3(stride)
        self.padding = _t3(padding)
        kd, kh, kw = self.kernel
        w = torch.empty(kd, kh, kw, in_ch, out_ch)
        torch.nn.init.kaiming_uniform_(w.view(-1, out_ch), a=5**0.5)
        self.weight = torch.nn.Parameter(w)

    def _dense_conv(self, x, stride, padding):
        import torch.nn.functional as F

        w = self.weight.permute(4, 3, 0, 1, 2)  # (O, I, kd, kh, kw)
        return F.conv3d(x.dense(), w, stride=stride, padding=padding)


class _ShimSubMConv3d(_ShimSparseConvBase):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 bias=False, indice_key=None):
        import torch

        torch.nn.Module.__init__(self)
        self._init(in_ch, out_ch, kernel_size, 1, 0, bias)

    def forward(self, x):
        # centered stencil at input sites; dense conv with SAME padding
        pad = tuple(k // 2 for k in self.kernel)
        y = self._dense_conv(x, (1, 1, 1), pad)
        idx = x.indices.long()
        feats = y[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]]
        return _ShimSparseConvTensor(
            feats, x.indices, x.spatial_shape, x.batch_size
        )


class _ShimSparseConv3d(_ShimSparseConvBase):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 bias=False, indice_key=None):
        import torch

        torch.nn.Module.__init__(self)
        self._init(in_ch, out_ch, kernel_size, stride, padding, bias)

    def forward(self, x):
        import torch
        import torch.nn.functional as F

        y = self._dense_conv(x, self.stride, self.padding)
        # spconv output-site rule via an occupancy conv with a ones
        # kernel; occupancy marks SITES (even all-zero features)
        d, h, w = x.spatial_shape
        occ = torch.zeros(x.batch_size, 1, d, h, w)
        idx = x.indices.long()
        occ[idx[:, 0], 0, idx[:, 1], idx[:, 2], idx[:, 3]] = 1.0
        ones = torch.ones((1, 1) + self.kernel)
        reach = F.conv3d(occ, ones, stride=self.stride,
                         padding=self.padding)
        sites = (reach[:, 0] > 0).nonzero()  # (O, 4) [b, z, y, x]
        feats = y[sites[:, 0], :, sites[:, 1], sites[:, 2], sites[:, 3]]
        return _ShimSparseConvTensor(
            feats, sites.int(), list(y.shape[2:]), x.batch_size
        )


def _make_shim_sparse_sequential():
    import torch

    # the conv shims subclass nn.Module lazily (torch import at call time)
    class _SubM(_ShimSubMConv3d, torch.nn.Module):
        pass

    class _Sparse(_ShimSparseConv3d, torch.nn.Module):
        pass

    class _Seq(torch.nn.Sequential):
        def forward(self, x):
            for mod in self:
                if isinstance(mod, (_SubM, _Sparse, _Seq)):
                    x = mod(x)
                else:  # BatchNorm1d / ReLU act on the feature matrix
                    x = _ShimSparseConvTensor(
                        mod(x.features), x.indices, x.spatial_shape,
                        x.batch_size,
                    )
            return x

    return _Seq, _SubM, _Sparse


def _install_stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_installed = False


def load_reference():
    """Make ``opencood.*`` importable (read-only) and return the package
    root path. Idempotent."""
    global _installed
    if _installed:
        return REF_ROOT
    sys.dont_write_bytecode = True  # never write __pycache__ into the ref

    if "icecream" not in sys.modules:
        _install_stub(
            "icecream",
            ic=lambda *a, **k: (a[0] if len(a) == 1 else a) or None,
        )
    if "pyquaternion" not in sys.modules:
        class _NoQuaternion:  # contracts never touch quaternion paths
            def __init__(self, *a, **k):
                raise RuntimeError(
                    "pyquaternion stub: not available in parity tests"
                )

        _install_stub("pyquaternion", Quaternion=_NoQuaternion)
    if "shapely" not in sys.modules:
        class _NoGeom:  # Point/MultiPoint: imported, not used by contracts
            def __init__(self, *a, **k):
                raise RuntimeError("shapely stub: only Polygon implemented")

        shapely = _install_stub("shapely")
        geometry = _install_stub(
            "shapely.geometry",
            Polygon=_ShimPolygon,
            Point=_NoGeom,
            MultiPoint=_NoGeom,
        )
        shapely.geometry = geometry
    if "open3d" not in sys.modules:
        _install_stub("open3d")
    if "termcolor" not in sys.modules:
        _install_stub("termcolor", colored=lambda s, *a, **k: s)
    if "spconv" not in sys.modules:
        # real pure-torch shim (see classes above) — runs the reference
        # VoxelBackBone8x exactly on small grids for SECOND parity tests
        class _NoSparse:  # inverse conv: unused by the reference backbone
            def __init__(self, *a, **k):
                raise RuntimeError("spconv shim: SparseInverseConv3d "
                                   "not implemented")

        seq, subm, sparse = _make_shim_sparse_sequential()
        names = dict(
            SparseSequential=seq,
            SubMConv3d=subm,
            SparseConv3d=sparse,
            SparseInverseConv3d=_NoSparse,
            SparseConvTensor=_ShimSparseConvTensor,
        )
        spconv = _install_stub("spconv", **names)
        spconv.pytorch = _install_stub("spconv.pytorch", **names)
    if "timm" not in sys.modules:
        class _NoDropPath:  # only constructed by the SDTA aligner
            def __init__(self, *a, **k):
                raise RuntimeError("timm stub: DropPath unavailable")

        timm = _install_stub("timm")
        timm_models = _install_stub("timm.models")
        layers = _install_stub("timm.models.layers", DropPath=_NoDropPath)
        timm_models.layers = layers
        timm.models = timm_models
    if "efficientnet_pytorch" not in sys.modules:
        class _NoEffNet:
            @classmethod
            def from_pretrained(cls, *a, **k):
                raise RuntimeError("efficientnet stub: not available")

        _install_stub("efficientnet_pytorch", EfficientNet=_NoEffNet)
    if "torchvision" not in sys.modules:
        # camera_utils only needs importability of the transforms names
        class _Normalize:
            def __init__(self, *a, **k):
                pass

        class _Chain:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                raise RuntimeError("torchvision stub: not callable")

        def _no_resnet(*a, **k):
            raise RuntimeError("torchvision stub: resnet101 unavailable")

        tv = _install_stub("torchvision")
        tv.transforms = types.SimpleNamespace(
            Normalize=_Normalize,
            Compose=_Chain,
            ToPILImage=_Chain,
            ToTensor=_Chain,
        )
        resnet_mod = _install_stub(
            "torchvision.models.resnet", resnet101=_no_resnet
        )
        models_mod = _install_stub("torchvision.models", resnet=resnet_mod)
        tv.models = models_mod
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # the Cython overlaps extension is not compiled here; register the
    # numpy reimplementation under its import name BEFORE anything pulls it
    if "opencood.utils.box_overlaps" not in sys.modules:
        import opencood.utils  # noqa: F401  (namespace init)

        _install_stub(
            "opencood.utils.box_overlaps", bbox_overlaps=_bbox_overlaps
        )
    _installed = True
    return REF_ROOT
