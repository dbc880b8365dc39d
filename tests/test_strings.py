import math

import numpy as np
import pytest

from pclean_tpu import native
from pclean_tpu.strings import (CharBigramLM, osa_distances, pad_char_codes,
                                typos_logdensity_matrix, _nb_logpmf)
from pclean_tpu.utils import IMPOSSIBLE


def _osa_ref(a: str, b: str) -> int:
    """Straightforward O(n m) restricted Damerau-Levenshtein for checking."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


WORDS = ["", "a", "ab", "ba", "abc", "acb", "hello", "hallo", "hlelo",
         "world", "wordl", "kitten", "sitting", "xyz", "memorial hospital"]


def test_osa_matrix_matches_reference_dp():
    got = osa_distances(WORDS, WORDS)
    for i, a in enumerate(WORDS):
        for j, b in enumerate(WORDS):
            assert got[i, j] == _osa_ref(a, b), (a, b)


def test_osa_numpy_fallback_matches():
    L = max(len(w) for w in WORDS)
    ac, al = pad_char_codes(WORDS, L)
    got = native._osa_numpy(ac, al, ac, al)
    for i, a in enumerate(WORDS):
        for j, b in enumerate(WORDS):
            assert got[i, j] == _osa_ref(a, b), (a, b)


def test_subsequence_matrix():
    shorts = ["abc", "ac", "b", ""]
    longs = ["aebfc", "abc", "zz"]
    L = 6
    sc, sl = pad_char_codes(shorts, L)
    lc, ll = pad_char_codes(longs, L)
    m = native.subsequence_matrix(sc, sl, lc, ll)
    expect = [[1, 1, 0], [1, 1, 0], [1, 1, 0], [1, 1, 1]]
    assert m.tolist() == expect


def test_nb_logpmf_matches_formula():
    # NegativeBinomial(r=2, p=0.9): pmf(0) = 0.81, pmf(1) = 2*0.81*0.1
    assert np.allclose(np.exp(_nb_logpmf(np.array([0.0]), np.array([2.0]), 0.9)), 0.81)
    assert np.allclose(np.exp(_nb_logpmf(np.array([1.0]), np.array([2.0]), 0.9)),
                       2 * 0.81 * 0.1)


def test_typos_matrix_semantics():
    # add_typos.jl:50-66: score = NB(ceil(len/5), .9).logpmf(d)
    #                     - d*log(len) - (d/2)*log(26)
    src = ["hello"]
    obs = ["hello", "hellp", "help", "zzzzzz"]
    m = typos_logdensity_matrix(obs, src)
    d0 = _nb_logpmf(np.array([0.0]), np.array([1.0]), 0.9)[0]
    assert np.allclose(m[0, 0], d0, atol=1e-5)
    d1 = _nb_logpmf(np.array([1.0]), np.array([1.0]), 0.9)[0] \
        - math.log(5) - 0.5 * math.log(26)
    assert np.allclose(m[1, 0], d1, atol=1e-5)
    assert m[0, 0] > m[1, 0] > m[2, 0] > m[3, 0]


def test_typos_matrix_max_typos_cap():
    m = typos_logdensity_matrix(["abcdef"], ["zzzzzz"], max_typos=2)
    assert m[0, 0] == pytest.approx(IMPOSSIBLE)


def test_bigram_lm_scores():
    lm = CharBigramLM.fit(["the quick brown fox", "hello world"] * 3)
    s1 = lm.logdensity("hello", 3, 30)
    assert np.isfinite(s1)
    # Out-of-range length -> -inf (string_prior.jl:44-46)
    assert lm.logdensity("ab", 3, 30) == -np.inf
    # Likely string beats garbage of the same length
    assert lm.logdensity("hello", 3, 30) > lm.logdensity("qqqqq", 3, 30)
    # Out-of-alphabet chars cost -log(28) each (string_prior.jl:55-58)
    base = lm.logdensity("hello", 1, 30)
    with_digit = lm.logdensity("hello7", 1, 30)
    assert with_digit < base


def test_bigram_lm_reference_csv_roundtrip(tmp_path):
    init = np.full(28, 1.0 / 28)
    trans = np.full((28, 28), 1.0 / 28)
    ip = tmp_path / "init.csv"
    tp = tmp_path / "trans.csv"
    np.savetxt(ip, init.reshape(1, -1), delimiter=",")
    np.savetxt(tp, trans, delimiter=",")
    lm = CharBigramLM.from_csv(str(ip), str(tp))
    # uniform model: score = -log(28)*len - log(num_lengths)
    got = lm.logdensity("abc", 3, 3)
    assert np.allclose(got, -3 * math.log(28), atol=1e-6)
