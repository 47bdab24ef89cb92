"""Weight-converter tests: the transpose-conv layout rule against a numpy
reference of TF's conv2d_transpose semantics, the pure-python TF bundle
reader on a hand-built bundle, and structural round-trip into the engine."""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demon_tpu.tools.converter import (
    convert_tf_variables,
    convert_transpose_conv_kernel,
    verify_against_engine,
)


# ---------------------------------------------------------------------------
# TF conv2d_transpose numpy reference
# ---------------------------------------------------------------------------

def tf_conv2d_transpose_ref(x, w_tf, stride, padding):
    """NHWC conv2d_transpose as TF defines it (gradient of conv2d):
    zero-upsample by stride, pad, correlate with the spatially flipped,
    channel-swapped kernel. w_tf: [kh, kw, out, in]."""
    b, h, w, cin = x.shape
    kh, kw, cout, cin2 = w_tf.shape
    assert cin == cin2
    # zero-upsample
    up = np.zeros((b, (h - 1) * stride + 1, (w - 1) * stride + 1, cin), x.dtype)
    up[:, ::stride, ::stride] = x
    if padding == "VALID":
        out_h = (h - 1) * stride + kh
        out_w = (w - 1) * stride + kw
        pad_t = kh - 1
        pad_l = kw - 1
    else:  # SAME
        out_h = h * stride
        out_w = w * stride
        pad_total_h = out_h - 1 + kh - up.shape[1]
        pad_total_w = out_w - 1 + kw - up.shape[2]
        pad_t = (kh - stride + 1) // 2 if stride > 1 else kh // 2
        # TF pads so that pad_before = kh - 1 - pad_after_conv; derive from
        # the conv-gradient identity: before = kh - 1 - floor of SAME pad
        pad_t = kh - 1 - ((kh - stride) // 2 + (kh - stride) % 2) \
            if stride > 1 else kh // 2
        pad_l = kw - 1 - ((kw - stride) // 2 + (kw - stride) % 2) \
            if stride > 1 else kw // 2
    padded = np.zeros((b, up.shape[1] + kh - 1 + kh - 1,
                       up.shape[2] + kw - 1 + kw - 1, cin), x.dtype)
    padded[:, kh - 1 : kh - 1 + up.shape[1],
           kw - 1 : kw - 1 + up.shape[2]] = up
    # correlate with flipped kernel (i.e. convolve with w)
    w_flip = w_tf[::-1, ::-1]  # [kh,kw,out,in]
    full_h = padded.shape[1] - kh + 1
    full_w = padded.shape[2] - kw + 1
    out_full = np.zeros((b, full_h, full_w, cout), x.dtype)
    for i in range(kh):
        for j in range(kw):
            out_full += np.einsum(
                "bhwc,oc->bhwo",
                padded[:, i : i + full_h, j : j + full_w], w_flip[i, j])
    # crop according to padding
    if padding == "VALID":
        return out_full[:, :out_h, :out_w]
    start_h = (full_h - out_h) // 2
    start_w = (full_w - out_w) // 2
    return out_full[:, start_h : start_h + out_h, start_w : start_w + out_w]


@pytest.mark.parametrize("padding", ["VALID", "SAME"])
def test_transpose_conv_conversion_matches_tf(padding):
    """flax ConvTranspose with the converted kernel == TF conv2d_transpose
    with the original kernel."""
    import flax.linen as nn

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 6, 3).astype(np.float32)
    w_tf = rng.randn(4, 4, 7, 3).astype(np.float32)  # [kh,kw,out,in]

    ref = tf_conv2d_transpose_ref(x, w_tf, stride=2, padding=padding)

    w_flax = convert_transpose_conv_kernel(w_tf)  # [kh,kw,in,out]
    mod = nn.ConvTranspose(features=7, kernel_size=(4, 4), strides=(2, 2),
                           padding=padding, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w_flax)}}
    out = np.asarray(mod.apply(params, jnp.asarray(x)))

    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, atol=1e-4)


# ---------------------------------------------------------------------------
# TF bundle reader on a hand-built checkpoint
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _proto_entry(dtype, shape, shard, offset, size) -> bytes:
    msg = b""
    msg += b"\x08" + _varint(dtype)                      # field 1 varint
    shape_msg = b""
    for d in shape:
        dim = b"\x08" + _varint(d)                       # Dim.size = 1
        shape_msg += b"\x12" + _varint(len(dim)) + dim   # dim = 2
    msg += b"\x12" + _varint(len(shape_msg)) + shape_msg  # field 2
    msg += b"\x18" + _varint(shard)                      # field 3
    msg += b"\x20" + _varint(offset)                     # field 4
    msg += b"\x28" + _varint(size)                       # field 5
    return msg


def _build_block(entries) -> bytes:
    """LevelDB data block: full keys (no prefix sharing), 1 restart."""
    buf = b""
    for key, value in entries:
        buf += _varint(0) + _varint(len(key)) + _varint(len(value))
        buf += key + value
    buf += struct.pack("<I", 0)   # restart[0]
    buf += struct.pack("<I", 1)   # num_restarts
    return buf


def _build_table(entries) -> bytes:
    """Minimal leveldb table: one data block + index + footer."""
    data_block = _build_block(entries)
    out = data_block + b"\x00" + b"\x00\x00\x00\x00"  # type + crc
    data_handle = _varint(0) + _varint(len(data_block))
    index_block = _build_block([(b"\xff\xff", data_handle)])
    index_off = len(out)
    out += index_block + b"\x00" + b"\x00\x00\x00\x00"
    meta_handle = _varint(index_off) + _varint(0)  # empty metaindex
    index_handle = _varint(index_off) + _varint(len(index_block))
    footer = meta_handle + index_handle
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", 0xDB4775248B80FB57)
    return out + footer


def test_tf_bundle_reader(tmp_path):
    from demon_tpu.tools.tf_bundle import read_tf_checkpoint

    rng = np.random.RandomState(0)
    a = rng.randn(3, 4).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    data = a.tobytes() + b.tobytes()

    entries = [
        (b"", b""),  # header
        (b"net/a/kernel", _proto_entry(1, a.shape, 0, 0, a.nbytes)),
        (b"net/b/bias", _proto_entry(1, b.shape, 0, a.nbytes, b.nbytes)),
    ]
    prefix = str(tmp_path / "ckpt")
    with open(prefix + ".index", "wb") as f:
        f.write(_build_table(entries))
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(data)

    out = read_tf_checkpoint(prefix)
    np.testing.assert_array_equal(out["net/a/kernel"], a)
    np.testing.assert_array_equal(out["net/b/bias"], b)


# ---------------------------------------------------------------------------
# full structural round trip
# ---------------------------------------------------------------------------

def test_convert_structure_roundtrip():
    """Flatten the engine's init tree into TF-style names, convert back,
    and verify structure + upconv kernel round trip."""
    from demon_tpu.engine.inference import DemonEngine

    engine = DemonEngine(variant="v1")
    expected = engine.init(jax.random.key(0))

    variables = {}
    for section in ("bootstrap", "iterative", "refinement"):
        flat = jax.tree_util.tree_flatten_with_path(
            expected[section]["params"])[0]
        for path, leaf in flat:
            names = [p.key for p in path]
            tf_name = "/".join(names)
            value = np.asarray(leaf)
            if names[-1] == "kernel" and value.ndim == 4 and "upconv" in names:
                # inverse of the conversion rule
                value = np.ascontiguousarray(
                    value.transpose(0, 1, 3, 2)[::-1, ::-1])
            variables[tf_name] = value

    params = convert_tf_variables(variables)
    verify_against_engine(params, "v1")

    # an upconv kernel must round-trip exactly
    orig = np.asarray(
        expected["bootstrap"]["params"]["netFlow1"]["refine4"]["upconv"]["kernel"])
    conv = np.asarray(
        params["bootstrap"]["params"]["netFlow1"]["refine4"]["upconv"]["kernel"])
    np.testing.assert_array_equal(orig, conv)


def test_full_converter_chain_end_to_end(tmp_path):
    """Write every v1 engine parameter into a synthetic TF bundle
    (leveldb table + raw data shard), read it back with the pure-python
    reader, convert, and verify the engine produces identical outputs to
    the original parameter tree."""
    import jax.numpy as jnp

    from demon_tpu.engine.inference import DemonEngine
    from demon_tpu.tools.tf_bundle import read_tf_checkpoint

    engine = DemonEngine(variant="v1", iterations=1)
    # init at 64x64 (the motion FC width depends on resolution; full-res
    # init on CPU is needlessly slow for this test)
    H = W = 64
    ip0 = jnp.zeros((1, H, W, 6))
    i220 = jnp.zeros((1, H // 4, W // 4, 3))
    intr0 = jnp.full((1, 4), 0.5)
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    boot = jax.jit(engine.bootstrap.init)(k1, ip0, i220)
    prev = jax.jit(engine.bootstrap.apply)(boot, ip0, i220)
    itp = jax.jit(engine.iterative.init)(k2, ip0, i220, intr0, prev)
    ref = jax.jit(engine.refinement.init)(k3, ip0[..., :3], prev.depth2)
    expected = {"bootstrap": boot, "iterative": itp, "refinement": ref}

    # flatten to TF-style variables (inverse-converting upconv kernels)
    variables = {}
    for section in ("bootstrap", "iterative", "refinement"):
        flat = jax.tree_util.tree_flatten_with_path(
            expected[section]["params"])[0]
        for path, leaf in flat:
            names = [p.key for p in path]
            value = np.asarray(leaf, np.float32)
            if names[-1] == "kernel" and value.ndim == 4 and "upconv" in names:
                value = np.ascontiguousarray(
                    value.transpose(0, 1, 3, 2)[::-1, ::-1])
            variables["/".join(names)] = value

    # write the bundle: entries sorted by key, single data shard
    data = b""
    entries = [(b"", b"")]
    for name in sorted(variables):
        v = variables[name]
        entries.append((name.encode(),
                        _proto_entry(1, v.shape, 0, len(data), v.nbytes)))
        data += v.tobytes()
    prefix = str(tmp_path / "demon_synthetic")
    with open(prefix + ".index", "wb") as f:
        f.write(_build_table(entries))
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(data)

    read_back = read_tf_checkpoint(prefix)
    assert len(read_back) == len(variables)
    params = convert_tf_variables(read_back)
    # (structure-vs-engine verification runs at full res in
    # test_convert_structure_roundtrip; here the forward-pass equality
    # below is the stronger end-to-end check)

    # identical forward pass
    rng = np.random.RandomState(0)
    ip = jnp.asarray(rng.rand(1, 64, 64, 6).astype(np.float32) - 0.5)
    i22 = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32) - 0.5)
    out_a = engine.predict(expected, ip, i22)
    out_b = engine.predict(jax.tree.map(jnp.asarray, params), ip, i22)
    np.testing.assert_allclose(np.asarray(out_a.depth_refined),
                               np.asarray(out_b.depth_refined), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_a.prediction.rotation),
                               np.asarray(out_b.prediction.rotation),
                               atol=1e-6)
