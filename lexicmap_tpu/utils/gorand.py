"""Bit-exact reimplementation of Go's math/rand source (rngSource).

The reference generates its LexicHash masks with Go's default PRNG
(lexichash.NewWithSeed -> rand.New(rand.NewSource(seed)); call site
ref: lib-index-build.go:235, masks.go:137).  Reproducing the exact
stream makes default-seed mask sets identical to the reference's,
which in turn makes seed placement, chaining scores, and top-N genome
selection bit-compatible.

Go's source is an additive lagged-Fibonacci generator
    a[n] = a[n-273] + a[n-607]  (mod 2^64)
seeded by an LCG whose outputs are XORed with a constant table
``rngCooked`` (go/src/math/rand/rng.go).  That table is recomputed
offline by scripts/gen_go_rand_cooked.py (polynomial jump-ahead over
the 7.8e12 warm-up steps of go's gen_cooked.go) and stored in
_go_rng_cooked.npy; the whole reconstruction is verified against the
canonical rand.NewSource(1).Int63() stream in tests/test_gorand.py.
"""

from __future__ import annotations

import os

import numpy as np

_LEN = 607
_TAP = 273
_MASK64 = (1 << 64) - 1
_MASK63 = (1 << 63) - 1
_A, _M, _Q, _R = 48271, 2147483647, 44488, 3399

_COOKED_PATH = os.path.join(os.path.dirname(__file__), "_go_rng_cooked.npy")
_COOKED: list[int] | None = None


def _cooked() -> list[int]:
    global _COOKED
    if _COOKED is None:
        _COOKED = [int(x) for x in np.load(_COOKED_PATH)]
    return _COOKED


def _seedrand(x: int) -> int:
    hi, lo = divmod(x, _Q)
    x = _A * lo - _R * hi
    if x < 0:
        x += _M
    return x


class GoRand:
    """rand.New(rand.NewSource(seed)) with the method subset LexicMap needs."""

    __slots__ = ("vec", "tap", "feed")

    def __init__(self, seed: int):
        self.seed(seed)

    def seed(self, seed: int) -> None:
        cooked = _cooked()
        self.tap = 0
        self.feed = _LEN - _TAP
        seed = seed % _M
        if seed < 0:
            seed += _M
        if seed == 0:
            seed = 89482311
        x = seed
        vec = [0] * _LEN
        for i in range(-20, _LEN):
            x = _seedrand(x)
            if i >= 0:
                u = x << 40
                x = _seedrand(x)
                u ^= x << 20
                x = _seedrand(x)
                u ^= x
                u ^= cooked[i]
                vec[i] = u & _MASK64
        self.vec = vec

    def uint64(self) -> int:
        self.tap -= 1
        if self.tap < 0:
            self.tap += _LEN
        self.feed -= 1
        if self.feed < 0:
            self.feed += _LEN
        x = (self.vec[self.feed] + self.vec[self.tap]) & _MASK64
        self.vec[self.feed] = x
        return x

    def int63(self) -> int:
        return self.uint64() & _MASK63

    def uint32(self) -> int:
        return (self.int63() >> 31) & 0xFFFFFFFF

    def int31(self) -> int:
        return self.int63() >> 32

    def int63n(self, n: int) -> int:
        # ref: go/src/math/rand/rand.go Int63n
        if n & (n - 1) == 0:
            return self.int63() & (n - 1)
        mx = (1 << 63) - 1 - (1 << 63) % n
        v = self.int63()
        while v > mx:
            v = self.int63()
        return v % n

    def int31n(self, n: int) -> int:
        # ref: go/src/math/rand/rand.go Int31n (the exported, biased-reject one)
        if n & (n - 1) == 0:
            return self.int31() & (n - 1)
        mx = (1 << 31) - 1 - (1 << 31) % n
        v = self.int31()
        while v > mx:
            v = self.int31()
        return v % n

    def _int31n_fast(self, n: int) -> int:
        # ref: go/src/math/rand/rand.go int31n (unexported; used by Shuffle)
        v = self.uint32()
        prod = v * n
        low = prod & 0xFFFFFFFF
        if low < n:
            thresh = ((1 << 32) - n) % n
            while low < thresh:
                v = self.uint32()
                prod = v * n
                low = prod & 0xFFFFFFFF
        return prod >> 32

    def intn(self, n: int) -> int:
        # ref: go/src/math/rand/rand.go Intn (64-bit platform)
        if n <= 0:
            raise ValueError("invalid argument to intn")
        if n <= (1 << 31) - 1:
            return self.int31n(n)
        return self.int63n(n)

    def float64(self) -> float:
        # ref: go/src/math/rand/rand.go Float64
        while True:
            f = self.int63() / (1 << 63)
            if f < 1:
                return f

    def shuffle_swaps(self, n: int):
        """Yield the (i, j) swap sequence of rand.Shuffle(n, swap)."""
        # ref: go/src/math/rand/rand.go Shuffle
        i = n - 1
        while i > (1 << 31) - 2:
            yield i, self.int63n(i + 1)
            i -= 1
        while i > 0:
            yield i, self._int31n_fast(i + 1)
            i -= 1

    def shuffle_list(self, xs: list) -> None:
        for i, j in self.shuffle_swaps(len(xs)):
            xs[i], xs[j] = xs[j], xs[i]

    def perm(self, n: int) -> list[int]:
        # ref: go/src/math/rand/rand.go Perm
        m = [0] * n
        for i in range(1, n):
            j = self.intn(i + 1)
            m[i] = m[j]
            m[j] = i
        return m
