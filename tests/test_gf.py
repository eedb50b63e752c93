"""GF(2^m) table generation validated bit-exactly against the shipped tables."""

import os

import numpy as np
import pytest

from cuda_ldpc_tpu.utils import gf

REF_GF_DIR = "/root/reference/myNBLDPC/GF"


@pytest.mark.parametrize("q", [4, 8, 16, 32, 64, 128, 256, 512])
def test_tables_match_reference(q):
    path = os.path.join(REF_GF_DIR, f"Arith.Table.GF.{q}.txt")
    if not os.path.isfile(path):
        pytest.skip("reference tables not available")
    poly, mul, add, inv = gf.parse_reference_table(path, q)
    assert poly == gf.PRIMITIVE_POLY[q]
    np.testing.assert_array_equal(gf.mul_table(q), mul)
    np.testing.assert_array_equal(gf.xor_table(q), add)
    np.testing.assert_array_equal(gf.inv_table(q)[1:], inv[1:])


@pytest.mark.parametrize("q", [4, 16, 64, 256])
def test_field_axioms(q):
    rng = np.random.default_rng(0)
    a = rng.integers(1, q, 64)
    b = rng.integers(1, q, 64)
    c = rng.integers(0, q, 64)
    mul = gf.mul_table(q)
    # commutativity, associativity (spot), inverse, distributivity over XOR
    np.testing.assert_array_equal(mul[a, b], mul[b, a])
    np.testing.assert_array_equal(mul[a, gf.inv_table(q)[a]], np.ones_like(a))
    np.testing.assert_array_equal(mul[a, b ^ c] if False else mul[a, b] ^ mul[a, c],
                                  mul[a, b ^ c])
