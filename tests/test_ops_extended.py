"""Golden tests for the op-zoo completion set: detection ops, ND
space/batch, strided reductions, deconv3d, grouped 1d variants,
unsorted segments, arange, data_convert
(ref analog: tests/validation_layer/ per-op goldens vs PyTorch,
tests/python_ref/ generators)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from csinn2_tpu.core.dtypes import Dtype
from csinn2_tpu.core.tensor import Tensor, TensorMeta
from csinn2_tpu.ops import api as ops
from csinn2_tpu.ops import params as P


def _np(t):
    return np.asarray(t.data if isinstance(t, Tensor) else t)


def test_arange():
    out = _np(ops.arange(P.ArangeParams(start=2.0, stop=11.0, step=3.0)))
    np.testing.assert_allclose(out, np.arange(2.0, 11.0, 3.0, dtype=np.float32))


def test_space_batch_nd_roundtrip(rng):
    x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    p = P.SpaceToBatchNdParams(block_shape=(2, 4), pads=((0, 0), (0, 0)))
    s2b = _np(ops.space_to_batch_nd(x, p))
    assert s2b.shape == (2 * 8, 3, 2, 3)
    back = _np(ops.batch_to_space_nd(s2b, p))
    np.testing.assert_allclose(back, x)
    # vs torch/tf semantics via pixel_shuffle-free manual check on 1 block dim
    p1 = P.SpaceToBatchNdParams(block_shape=(2,), pads=((1, 1),))
    x1 = rng.standard_normal((1, 4, 5)).astype(np.float32)
    out1 = _np(ops.space_to_batch_nd(x1, p1))
    assert out1.shape == (2, 3, 5)
    back1 = _np(ops.batch_to_space_nd(out1, p1))
    np.testing.assert_allclose(back1, x1)


def test_mean_min_stride(rng):
    # reduce a [4, 6] tensor over axis 1 expressed as explicit strides
    x = rng.standard_normal((4, 6)).astype(np.float32)
    p = P.StridedReduceParams(out_strides=(6,), out_extents=(4,),
                              inner_strides=(1,), inner_extents=(6,))
    np.testing.assert_allclose(_np(ops.mean_stride(x, p)), x.mean(1), rtol=1e-6)
    np.testing.assert_allclose(_np(ops.min_stride(x, p)), x.min(1), rtol=1e-6)
    # inner reduction over axis 0 instead (strided, non-contiguous)
    p2 = P.StridedReduceParams(out_strides=(1,), out_extents=(6,),
                               inner_strides=(6,), inner_extents=(4,))
    np.testing.assert_allclose(_np(ops.mean_stride(x, p2)), x.mean(0), rtol=1e-6)


def test_deconv3d_vs_torch(rng):
    x = rng.standard_normal((1, 3, 4, 5, 6)).astype(np.float32)
    w = (rng.standard_normal((3, 4, 2, 3, 3)) * 0.2).astype(np.float32)  # I O kd kh kw
    b = rng.standard_normal(4).astype(np.float32)
    want = F.conv_transpose3d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=(2, 1, 2),
                              padding=(0, 1, 1)).numpy()
    got = _np(ops.deconv3d(x, w, b, P.Conv3dParams(stride=(2, 1, 2),
                                                   pad=(0, 0, 1, 1, 1, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_depthwise_group_conv1d_vs_torch(rng):
    x = rng.standard_normal((2, 6, 20)).astype(np.float32)
    w = (rng.standard_normal((6, 1, 3)) * 0.3).astype(np.float32)
    want = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), groups=6,
                    padding=1).numpy()
    got = _np(ops.depthwise_conv1d(x, w, None,
                                   P.Conv1dParams(group=6, pad=(1, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    wg = (rng.standard_normal((4, 3, 3)) * 0.3).astype(np.float32)
    want = F.conv1d(torch.from_numpy(x), torch.from_numpy(wg), groups=2).numpy()
    got = _np(ops.group_conv1d(x, wg, None, P.Conv1dParams(group=2)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_depthwise_deconv2d_vs_torch(rng):
    x = rng.standard_normal((1, 4, 7, 7)).astype(np.float32)
    w = (rng.standard_normal((4, 1, 3, 3)) * 0.3).astype(np.float32)  # I O/g kh kw
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              stride=2, padding=1, groups=4).numpy()
    got = _np(ops.depthwise_deconv2d(x, w, None,
                                     P.Deconv2dParams(group=4, stride=(2, 2),
                                                      pad=(1, 1, 1, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unsorted_segment_ops(rng):
    x = rng.standard_normal((7, 3)).astype(np.float32)
    ids = np.array([3, 1, 0, 1, 3, 2, 1], np.int32)   # unsorted
    p = P.SegmentParams(num_segments=4, unsorted=True)
    got = _np(ops.unsorted_segment_sum(x, ids, p))
    want = np.zeros((4, 3), np.float32)
    np.add.at(want, ids, x)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_max = _np(ops.unsorted_segment_max(x, ids, p))
    for s in range(4):
        np.testing.assert_allclose(got_max[s], x[ids == s].max(0), rtol=1e-6)
    got_mean = _np(ops.unsorted_segment_mean(x, ids, p))
    for s in range(4):
        np.testing.assert_allclose(got_mean[s], x[ids == s].mean(0), rtol=1e-5)


def test_roialign_vs_torchvision(rng):
    torchvision = pytest.importorskip("torchvision")
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    rois = np.array([[0, 1.0, 1.0, 10.0, 12.0],
                     [0, 4.0, 2.0, 14.0, 9.0]], np.float32)
    got = _np(ops.roialign(x, rois, P.RoiAlignParams(pooled_size=(4, 4),
                                                     spatial_scale=1.0,
                                                     sample_ratio=2)))
    want = torchvision.ops.roi_align(torch.from_numpy(x), torch.from_numpy(rois),
                                     output_size=(4, 4), spatial_scale=1.0,
                                     sampling_ratio=2, aligned=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_psroipooling_shape_and_mass(rng):
    g, od = 3, 2
    x = rng.standard_normal((1, od * g * g, 12, 12)).astype(np.float32)
    rois = np.array([[0, 0.0, 0.0, 11.0, 11.0]], np.float32)
    out = _np(ops.psroipooling(x, rois, P.PSROIPoolingParams(
        output_dim=od, group_size=g, spatial_scale=1.0)))
    assert out.shape == (1, od, g, g)
    # full-image roi, bin (ph,pw) of map (c,ph,pw) = mean over that bin region
    fmap = x[0].reshape(od, g, g, 12, 12)
    got_bin = out[0, 1, 0, 0]
    want_bin = fmap[1, 0, 0, 0:4, 0:4].mean()
    np.testing.assert_allclose(got_bin, want_bin, rtol=1e-5)


def test_proposal_runs_and_is_valid(rng):
    A = 9
    h = w = 8
    cls_prob = rng.random((1, 2 * A, h, w)).astype(np.float32)
    bbox_pred = (rng.standard_normal((1, 4 * A, h, w)) * 0.1).astype(np.float32)
    im_info = np.array([[128.0, 128.0, 1.0]], np.float32)
    rois = _np(ops.proposal(cls_prob, bbox_pred, im_info,
                            P.ProposalParams(rpn_post_nms_top_n=50,
                                             rpn_pre_nms_top_n=200)))
    assert rois.shape == (50, 5)
    assert (rois[:, 0] == 0).all()
    x1, y1, x2, y2 = rois[:, 1], rois[:, 2], rois[:, 3], rois[:, 4]
    assert (x1 >= 0).all() and (y1 >= 0).all()
    assert (x2 <= 127.0).all() and (y2 <= 127.0).all()
    assert (x2 >= x1).all() and (y2 >= y1).all()


def test_data_convert_requant(rng):
    from csinn2_tpu.core.quant import from_minmax, quantize
    x = rng.standard_normal((4, 8)).astype(np.float32) * 2.0
    qi_in = from_minmax(x.min(), x.max(), Dtype.INT8, symmetric=True)
    qi_out = from_minmax(x.min() / 2, x.max() / 2, Dtype.INT8, symmetric=True)
    xq = quantize(x, qi_in)
    t = Tensor(data=xq, meta=TensorMeta(shape=x.shape, dtype=Dtype.INT8, qinfo=qi_in))
    out = ops.data_convert(t, out_qinfo=qi_out)
    assert _np(out).dtype == np.int8
    # round-trip error bounded by the coarser scale
    from csinn2_tpu.core.quant import dequantize
    deq = np.asarray(dequantize(_np(out), qi_out))
    ref = np.clip(x, -qi_out.scale * 127, qi_out.scale * 127)
    # error budget: 0.5 LSB from the input quantization (scale = 2× output's)
    # plus 0.5 LSB from the requant rounding
    assert np.abs(deq - ref).max() <= qi_in.scale * 0.5 + qi_out.scale * 0.5 + 1e-6
