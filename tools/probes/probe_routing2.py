"""4-ary routing occupancy + occupancy histogram for binary routing."""
import numpy as np

def build(M, D, dist, seed):
    rng = np.random.default_rng(seed)
    if dist == "uniform": d = rng.integers(0, D, size=M)
    elif dist == "zipf": d = (rng.zipf(1.3, size=M) - 1) % D
    elif dist == "revsorted": d = np.sort(rng.integers(0, D, size=M))[::-1]
    elif dist == "fewuniq": d = rng.integers(0, 3, size=M) * (D // 3)
    order_idx = np.argsort(d, kind="stable")
    dest = np.empty(M, dtype=np.int64); dest[order_idx] = np.arange(M)
    return dest

def route(M, dest, radix):
    delta = (dest - np.arange(M)) % M
    pos = np.arange(M)
    digits = int(np.round(np.log(M) / np.log(radix)))
    assert radix ** digits == M
    worst = 1
    for j in range(digits):
        step = (delta // (radix ** j)) % radix
        newpos = (pos + step * (radix ** j)) % M
        occ = np.bincount(newpos, minlength=M)
        worst = max(worst, occ.max())
        pos = newpos
        delta = delta - step * (radix ** j)
    assert np.all(delta % M == 0)
    return worst

for M, radix in ((1 << 16, 2), (1 << 16, 4), (1 << 20, 2), (1 << 20, 4), (1 << 16, 16)):
    w = 1
    for D in (256, 16):
        for dist in ("uniform", "zipf", "revsorted", "fewuniq"):
            for s in range(2):
                w = max(w, route(M, build(M, D, dist, s), radix))
    print(f"M=2^{int(np.log2(M))} radix={radix}: worst occupancy {w}")
