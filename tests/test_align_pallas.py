import numpy as np
import pytest

from flye_tpu.ops.align import edit_distance_batch
from flye_tpu.ops.align_pallas import edit_distance_batch_pallas


def test_pallas_matches_jnp(rng):
    B, S = 24, 128
    a = rng.integers(0, 4, size=(B, S)).astype(np.uint8)
    b = rng.integers(0, 4, size=(B, S)).astype(np.uint8)
    al = rng.integers(0, S + 1, size=B).astype(np.int32)
    bl = rng.integers(0, S + 1, size=B).astype(np.int32)
    ref = np.asarray(edit_distance_batch(a, al, b, bl))
    got = np.asarray(edit_distance_batch_pallas(a, al, b, bl,
                                                interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_pallas_ragged_batch(rng):
    # batch size not divisible by the tile size
    B, S = 11, 128
    a = rng.integers(0, 4, size=(B, S)).astype(np.uint8)
    b = a.copy()
    al = np.full(B, S, np.int32)
    bl = np.full(B, S, np.int32)
    got = np.asarray(edit_distance_batch_pallas(a, al, b, bl,
                                                interpret=True))
    np.testing.assert_array_equal(got, np.zeros(B, np.int64))
