"""StreamingPredictor: incremental emissions must match the offline
windowed stitch (predict_all_images) frame for frame."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.infer import HmmrPredictor, StreamingPredictor
from human_dynamics_tpu.models import HmmrModel

RNG = np.random.RandomState(7)


def make_phi_predictor(batch_size=2):
    model = HmmrModel(include_resnet=False)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048))
    )
    return HmmrPredictor(
        model, variables, smpl, batch_size=batch_size, seq_length=20
    )


def collect(emissions):
    outs = {}
    for e in emissions:
        for k, v in e.items():
            outs.setdefault(k, []).append(np.asarray(v))
    return {k: np.concatenate(v, axis=0) for k, v in outs.items()}


def feed_in_pieces(sp, frames, sizes):
    emissions = []
    i = 0
    rng = np.random.RandomState(3)
    while i < len(frames):
        n = sizes if isinstance(sizes, int) else int(rng.choice(sizes))
        emissions += sp.feed(frames[i:i + n])
        i += n
    emissions += sp.flush()
    return emissions


@pytest.mark.parametrize("n_frames", [5, 8, 23, 40])
def test_streaming_matches_offline_phi_mode(n_frames):
    """phi-mode: emissions equal the offline stitch (same jitted window
    program on the same values)."""
    pred = make_phi_predictor(batch_size=2)
    phi = RNG.randn(n_frames, 2048).astype(np.float32)
    want = pred.predict_all_images(phi)

    sp = StreamingPredictor(pred, as_numpy=True)
    got = collect(feed_in_pieces(sp, phi, (1, 3, 7, 11)))
    assert set(got) == set(want)
    for k in want:
        assert got[k].shape == want[k].shape, k
        np.testing.assert_allclose(
            got[k], want[k], rtol=1e-5, atol=1e-5, err_msg=k
        )


def test_streaming_quantum_and_latency():
    """Emissions arrive exactly when quantum+margin frames exist."""
    pred = make_phi_predictor(batch_size=1)
    sp = StreamingPredictor(pred)
    assert sp.quantum == 8 and sp.margin == 6
    assert sp.latency_frames == 14
    phi = RNG.randn(30, 2048).astype(np.float32)
    # 13 frames: not enough for the first step (needs 8+6).
    assert sp.feed(phi[:13]) == []
    out = sp.feed(phi[13:14])
    assert len(out) == 1 and out[0]["omegas"].shape[0] == 8
    # 16 more frames -> two more steps.
    out = sp.feed(phi[14:30])
    assert len(out) == 2
    # flush covers the remaining 30 - 24 = 6 frames.
    tail = sp.flush()
    assert sum(o["omegas"].shape[0] for o in tail) == 6
    with pytest.raises(RuntimeError, match="reset"):
        sp.feed(phi[:1])
    sp.reset()
    assert sp.feed(phi[:5]) == []


def test_streaming_short_stream_flush_only():
    """Streams shorter than one quantum emit everything on flush."""
    pred = make_phi_predictor(batch_size=2)
    phi = RNG.randn(4, 2048).astype(np.float32)
    want = pred.predict_all_images(phi)
    sp = StreamingPredictor(pred, as_numpy=True)
    assert sp.feed(phi) == []
    got = collect(sp.flush())
    for k in want:
        np.testing.assert_allclose(
            got[k], want[k], rtol=1e-5, atol=1e-5, err_msg=k
        )


def test_streaming_empty_stream():
    pred = make_phi_predictor()
    sp = StreamingPredictor(pred)
    assert sp.feed(np.zeros((0, 2048), np.float32)) == []
    assert sp.flush() == []


def test_streaming_image_mode_uint8_int8_encoder():
    """Image mode with the serving config (uint8 ingest + static int8
    encoder + byte-direct u8 root): emissions match the offline fused
    program."""
    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    frames = RNG.randint(0, 256, (21, 64, 64, 3)).astype(np.uint8)
    pred = HmmrPredictor(
        model, variables, smpl, batch_size=1, seq_length=20,
        encode_chunk=8, int8_encoder=True,
        int8_calibration=frames[:8], int8_root="u8",
    )
    want = pred.predict_all_images(frames)
    sp = StreamingPredictor(pred, as_numpy=True)
    got = collect(feed_in_pieces(sp, frames, (2, 5, 9)))
    assert set(got) == set(want)
    for k in want:
        assert got[k].shape == want[k].shape, k
        # Encoder batch composition differs between the offline chunked
        # program and the streaming steps; int8 requant keeps values on
        # the same grid, omegas agree tightly.
        np.testing.assert_allclose(
            got["omegas"], want["omegas"], rtol=1e-3, atol=1e-3
        )

    with pytest.raises(ValueError, match="mixed"):
        sp2 = StreamingPredictor(pred)
        sp2.feed(frames[:2])
        sp2.feed(frames[:2].astype(np.float32))


def test_streaming_image_mode_fp32_matches_offline():
    """fp32 image mode tracks the offline path closely (conv batch
    tiling may differ at different batch shapes)."""
    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    frames = (RNG.rand(17, 64, 64, 3).astype(np.float32) * 2 - 1)
    pred = HmmrPredictor(
        model, variables, smpl, batch_size=2, seq_length=20,
        encode_chunk=8,
    )
    want = pred.predict_all_images(frames)
    sp = StreamingPredictor(pred, as_numpy=True)
    got = collect(feed_in_pieces(sp, frames, 6))
    for k in want:
        assert got[k].shape == want[k].shape, k
    np.testing.assert_allclose(
        got["omegas"], want["omegas"], rtol=1e-4, atol=1e-4
    )
