"""PredictionService: pipelined serving wrapper (infer/service.py)."""

import threading

import numpy as np
import pytest

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.infer import HmmrPredictor, PredictionService
from tests.test_infer import FakeHmmrModel

RNG = np.random.RandomState(11)


def make_service(**kw):
    smpl = synthetic_smpl_model(num_verts=48, num_kps=19)
    pred = HmmrPredictor(
        FakeHmmrModel(), variables=None, smpl=smpl,
        batch_size=2, seq_length=20,
    )
    return PredictionService(pred, **kw), pred


def test_service_matches_direct_predict():
    service, pred = make_service(as_numpy=True)
    phi = RNG.randn(37, 160).astype(np.float32) * 0.5
    with service:
        got = service.submit(phi).result(timeout=120)
    want = pred.predict_all_images(phi)
    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_allclose(got[k], want[k], err_msg=k)


def test_service_concurrent_submitters_and_stats():
    """Requests from many threads all resolve, in any order, with
    per-request results; counters add up."""
    service, pred = make_service(as_numpy=True)
    clips = {
        n: RNG.randn(n, 160).astype(np.float32) * 0.5
        for n in (21, 30, 37, 44)
    }
    results = {}
    errors = []

    def worker(n):
        try:
            results[n] = service.submit(clips[n]).result(timeout=300)
        except Exception as e:  # pragma: no cover
            errors.append((n, e))

    threads = [
        threading.Thread(target=worker, args=(n,)) for n in clips
    ]
    with service:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert not errors
    for n, clip in clips.items():
        assert results[n]["omegas"].shape == (n, 85)
        np.testing.assert_allclose(
            results[n]["omegas"],
            pred.predict_all_images(clip)["omegas"],
            err_msg=str(n),
        )
    stats = service.stats()
    assert stats["submitted"] == stats["completed"] == len(clips)
    assert stats["failed"] == 0
    assert stats["frames"] == sum(clips)


def test_service_request_error_isolated():
    """A malformed request fails only its own future."""
    service, _ = make_service(as_numpy=True)
    bad = np.zeros((5, 7), np.float32)          # wrong feature dim
    good = RNG.randn(25, 160).astype(np.float32) * 0.5
    with service:
        fut_bad = service.submit(bad)
        fut_good = service.submit(good)
        with pytest.raises(Exception):
            fut_bad.result(timeout=120)
        out = fut_good.result(timeout=120)
    assert out["omegas"].shape == (25, 85)
    stats = service.stats()
    assert stats["failed"] == 1
    assert stats["completed"] == 1


def test_service_rejects_after_close():
    service, _ = make_service()
    service.close()
    with pytest.raises(RuntimeError):
        service.submit(np.zeros((4, 160), np.float32))


def test_service_close_without_drain_fails_pending():
    service, _ = make_service(as_numpy=True)
    # Queue a few; close(drain=False) may fail any still unstarted.
    futs = [
        service.submit(RNG.randn(21, 160).astype(np.float32))
        for _ in range(3)
    ]
    service.close(drain=False)
    for fut in futs:
        try:
            out = fut.result(timeout=120)
            assert out["omegas"].shape == (21, 85)
        except RuntimeError as e:
            assert "closed" in str(e)


def test_streaming_session_matches_offline():
    """A stream served through the service (open_stream) emits
    offline-identical outputs, interleaved with offline submits on the
    same dispatcher."""
    service, pred = make_service(as_numpy=True)
    phi = RNG.randn(41, 160).astype(np.float32) * 0.5
    other = RNG.randn(23, 160).astype(np.float32) * 0.5
    with service:
        session = service.open_stream()
        assert session.quantum == pred.batch_size * (
            pred.seq_length - (pred.model.fov - 1)
        )
        futs = [session.feed(chunk) for chunk in np.array_split(phi, 7)]
        # Offline request rides the same dispatcher mid-stream.
        offline_fut = service.submit(other)
        futs.append(session.flush())
        emissions = [e for f in futs for e in f.result(timeout=300)]
        offline = offline_fut.result(timeout=300)
        stats = service.stats()

    got = {
        k: np.concatenate([e[k] for e in emissions])
        for k in emissions[0]
    }
    want = pred.predict_all_images(phi)
    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_allclose(
            got[k], want[k], atol=1e-5, err_msg=k
        )
    np.testing.assert_allclose(
        offline["omegas"], pred.predict_all_images(other)["omegas"],
        atol=1e-5,
    )
    assert stats["failed"] == 0
    assert stats["frames"] == len(phi) + len(other)

    # Feeding a finished stream fails that future only; reset reopens.
    with pytest.raises(RuntimeError):
        # service closed above - build a fresh one for lifecycle check
        session.feed(phi[:4])


def test_streaming_session_reset_reopens():
    service, _ = make_service(as_numpy=True)
    phi = RNG.randn(18, 160).astype(np.float32) * 0.5
    with service:
        session = service.open_stream()
        session.feed(phi)
        session.flush().result(timeout=300)
        fut = session.feed(phi[:4])   # finished stream -> request fails
        with pytest.raises(RuntimeError):
            fut.result(timeout=300)
        session.reset().result(timeout=300)
        out = [
            e for f in (session.feed(phi), session.flush())
            for e in f.result(timeout=300)
        ]
        assert sum(len(e["omegas"]) for e in out) == len(phi)
    assert service.stats()["failed"] == 1


def test_service_mesh_submit_matches_single_device():
    """A mesh-backed service runs offline clips data-parallel
    (predict_all_images_sharded) with single-device-identical results,
    while a live stream on the same service keeps the single-device
    path and still matches offline."""
    from human_dynamics_tpu.parallel import make_mesh

    mesh = make_mesh(8, axis_name="data")
    service, pred = make_service(as_numpy=True, mesh=mesh)
    phi = RNG.randn(53, 160).astype(np.float32) * 0.5
    stream_phi = RNG.randn(29, 160).astype(np.float32) * 0.5
    with service:
        fut = service.submit(phi)
        session = service.open_stream()
        feeds = [session.feed(c) for c in np.array_split(stream_phi, 3)]
        feeds.append(session.flush())
        got = fut.result(timeout=300)
        emissions = [e for f in feeds for e in f.result(timeout=300)]
        assert service.stats()["failed"] == 0

    want = pred.predict_all_images(phi)
    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_allclose(
            got[k], want[k], atol=2e-5, err_msg=k
        )
    streamed = np.concatenate([e["omegas"] for e in emissions])
    np.testing.assert_allclose(
        streamed, pred.predict_all_images(stream_phi)["omegas"],
        atol=1e-5,
    )


def test_service_mesh_halo_submit_matches_direct():
    """mesh_mode='halo' routes offline clips through the exact
    time-sharded full-clip forward (predict_clip_sharded), matching a
    direct call; bad mesh_mode values are rejected up front."""
    import jax
    import jax.numpy as jnp

    from human_dynamics_tpu.models.hmmr import HmmrModel
    from human_dynamics_tpu.parallel import make_mesh
    from human_dynamics_tpu.parallel.halo import predict_clip_sharded

    model = HmmrModel(feature_dim=64, do_hallucinate=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 64)))
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    pred = HmmrPredictor(
        model, variables, smpl, batch_size=2, seq_length=20
    )
    mesh = make_mesh(8, axis_name="time")

    with pytest.raises(ValueError):
        PredictionService(pred, mesh=mesh, mesh_mode="hallo")

    phi = RNG.randn(43, 64).astype(np.float32) * 0.5
    with PredictionService(
        pred, as_numpy=True, mesh=mesh, mesh_mode="halo"
    ) as service:
        got = service.submit(phi).result(timeout=300)
        assert service.stats()["failed"] == 0

    want = predict_clip_sharded(
        model, variables, smpl, jnp.asarray(phi), mesh
    )
    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_allclose(
            got[k], np.asarray(want[k]), atol=1e-6, err_msg=k
        )
