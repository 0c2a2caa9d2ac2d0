"""StreamingScorer: window semantics equal the offline scorer, model and
service backends work, uint8 normalization, reset."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cvad_tpu.evaluation.streaming import StreamingScorer  # noqa: E402


def _mean_score_fn(clips):
    # deterministic stand-in: per-clip mean -> tuple with a fake graph
    return clips.mean(axis=(1, 2, 3, 4)), np.ones((len(clips), 2, 2))


def test_stream_matches_offline_windows():
    """Fired starts/scores match clip_windows + aggregate_frame_scores on
    the same frame sequence."""
    from cvad_tpu.evaluation.scoring import aggregate_frame_scores

    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (23, 6, 6, 1)).astype(np.float32)
    s = StreamingScorer(_mean_score_fn, clip_len=8, stride=4)
    fired = s.push_many(frames)

    expect_starts = list(range(0, 23 - 8 + 1, 4))  # 0, 4, 8, 12
    assert [w.start for w in fired] == expect_starts
    for w in fired:
        np.testing.assert_allclose(
            w.score, frames[w.start:w.start + 8].mean(), rtol=1e-6)
        assert w.extras[0].shape == (2, 2)

    offline = aggregate_frame_scores(
        np.array(expect_starts), np.array([w.score for w in fired],
                                          np.float32), 8, 23)
    np.testing.assert_allclose(s.frame_scores(), offline, rtol=1e-6)


def test_stream_uint8_and_gray_frames():
    s = StreamingScorer(_mean_score_fn, clip_len=2, stride=1)
    s.push(np.full((4, 4), 255, np.uint8))  # 2-D gray -> (4, 4, 1)
    w = s.push(np.zeros((4, 4), np.uint8))
    np.testing.assert_allclose(w.score, 0.5, atol=1e-6)


def test_stream_shape_mismatch_and_reset():
    s = StreamingScorer(_mean_score_fn, clip_len=2, stride=1)
    s.push(np.zeros((4, 4, 1), np.float32))
    with pytest.raises(ValueError, match="frame shape"):
        s.push(np.zeros((5, 5, 1), np.float32))
    s.reset()
    s.push(np.zeros((5, 5, 1), np.float32))  # new stream, new shape ok
    assert s.n_seen == 1 and s.windows == []


def test_stream_with_model_and_service(rng):
    """Both a jitted model fn and the bucketed ClipScoringService drive the
    stream and agree with each other."""
    from cvad_tpu.config import FamilyCConfig
    from cvad_tpu.evaluation.serving import ClipScoringService
    from cvad_tpu.models import build_model

    model = build_model(FamilyCConfig())
    x1 = np.zeros((1, 8, 64, 64, 1), np.float32)
    variables = model.init(rng, x1)
    cpu = jax.devices("cpu")[0]

    def fn(clips):
        with jax.default_device(cpu):
            return np.asarray(model.apply(variables, clips)).reshape(-1)

    frames = np.random.default_rng(1).uniform(
        0, 1, (16, 64, 64, 1)).astype(np.float32)
    direct = StreamingScorer(fn, clip_len=8, stride=4)
    direct.push_many(frames)

    svc = ClipScoringService(fn, buckets=(1, 2), clip_shape=(8, 64, 64, 1))
    served = StreamingScorer(svc.score, clip_len=8, stride=4)
    served.push_many(frames)

    assert [w.start for w in direct.windows] == \
        [w.start for w in served.windows] == [0, 4, 8]
    np.testing.assert_allclose([w.score for w in served.windows],
                               [w.score for w in direct.windows], atol=1e-5)
