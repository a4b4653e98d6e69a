"""FineSampler order properties (ref utils/loader_utils.py:20-52)."""
import numpy as np

from fourdgs_tpu.train.sampler import fine_sample_order, stamp_indices


def test_fine_sampler_covers_and_correlates():
    rng = np.random.default_rng(0)
    n_poses, frame_length = 4, 10
    order = fine_sample_order(n_poses * frame_length, n_poses, rng)
    assert order.min() >= 0 and order.max() < n_poses * frame_length
    # temporally correlated: consecutive same-frame groups dominate
    frames = order % frame_length
    # each frame index appears (with replay extras interleaved)
    assert len(np.unique(frames)) == frame_length


def test_stamp_indices():
    times = np.array([0.0, 0.1, 0.0, 0.2, 0.0])
    np.testing.assert_array_equal(stamp_indices(times), [0, 2, 4])
    np.testing.assert_array_equal(stamp_indices(times, 0.2), [3])
