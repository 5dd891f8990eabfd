"""Encrypted FFT vs numpy.fft — the reference's fft/bfft demos
(``fft.cpp``) as tolerance tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from hetpu import fft as hefft
from hetpu.session import Session
from hetpu.utils.keycache import cached_session

SEED = b"\x04" * 32
N_FFT = 8


@pytest.fixture(scope="module")
def sess():
    return cached_session("test_deep", seed=SEED,
                          galois_steps=[1, -1, 2, -2, 4, -4])


def _encrypt_coeff_batch(sess, sig):
    """n complex coefficients → [n]-batched ciphertext (each ct's slots
    carry the same value; the reference batches 8192 independent signals —
    we batch the ct axis)."""
    cts = [sess.encrypt(c) for c in sig]
    return cts[0].with_(data=jnp.stack([c.data for c in cts]))


def _decrypt_coeff_batch(sess, ct):
    return np.array([sess.decrypt(ct.with_(data=ct.data[i]))[0]
                     for i in range(ct.data.shape[0])])


def test_fft_forward(sess, rng):
    sig = rng.uniform(-1, 1, N_FFT) + 1j * rng.uniform(-1, 1, N_FFT)
    ct = _encrypt_coeff_batch(sess, sig)
    out = hefft.fft(sess, ct)
    got = _decrypt_coeff_batch(sess, out)
    np.testing.assert_allclose(got, np.fft.fft(sig), atol=1e-3)


def test_fft_roundtrip(sess, rng):
    sig = rng.uniform(-1, 1, N_FFT) + 1j * rng.uniform(-1, 1, N_FFT)
    ct = _encrypt_coeff_batch(sess, sig)
    back = hefft.ifft(sess, hefft.fft(sess, ct))
    got = _decrypt_coeff_batch(sess, back)
    np.testing.assert_allclose(got, sig, atol=1e-3)


def test_bfft_forward(sess, rng):
    """In-slot FFT; output bit-reversed (reference parity — un-reversed
    here at decode like fft.cpp:224-238)."""
    sig = rng.uniform(-1, 1, N_FFT) + 1j * rng.uniform(-1, 1, N_FFT)
    tiled = np.tile(sig, sess.slots // N_FFT)
    ct = sess.encrypt(tiled)
    out = hefft.bfft(sess, ct, N_FFT)
    got = sess.decrypt(out)[:N_FFT]
    want = hefft.bit_reverse_order(np.fft.fft(sig))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_bfft_roundtrip(sess, rng):
    sig = rng.uniform(-1, 1, N_FFT) + 1j * rng.uniform(-1, 1, N_FFT)
    tiled = np.tile(sig, sess.slots // N_FFT)
    ct = sess.encrypt(tiled)
    back = hefft.ibfft(sess, hefft.bfft(sess, ct, N_FFT), N_FFT)
    got = sess.decrypt(back)[:N_FFT]
    np.testing.assert_allclose(got, sig, atol=1e-3)


def test_fft_plaintext_cache(sess, rng):
    """Second fft() call performs ZERO host encodes (VERDICT r1: the
    'twiddles precomputed once' claim must be real — SURVEY.md §2c)."""
    sig = rng.uniform(-1, 1, N_FFT) + 1j * rng.uniform(-1, 1, N_FFT)
    ct = _encrypt_coeff_batch(sess, sig)
    _ = hefft.fft(sess, ct)          # populate cache
    before = sess.encoder.encode_count
    _ = hefft.fft(sess, ct)
    assert sess.encoder.encode_count == before


def test_bfft_plaintext_cache(sess, rng):
    sig = rng.uniform(-1, 1, N_FFT) + 1j * rng.uniform(-1, 1, N_FFT)
    tiled = np.tile(sig, sess.slots // N_FFT)
    ct = sess.encrypt(tiled)
    _ = hefft.bfft(sess, ct, N_FFT)
    before = sess.encoder.encode_count
    _ = hefft.bfft(sess, ct, N_FFT)
    assert sess.encoder.encode_count == before
