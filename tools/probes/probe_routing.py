"""Can the stable-partition permutation be bit-routed conflict-free?

Permutation: block of M elements (row-major in (R,128)), each with digit d.
dest = stable counting-sort order. Route by displacement bits delta = dest-i
(mod M), LSB-first or MSB-first: at round j, elements with bit j of their
remaining displacement set rotate forward by 2^j. Count max slot occupancy.
"""
import numpy as np

def test(M, D, dist, order, seed=0):
    rng = np.random.default_rng(seed)
    if dist == "uniform":
        d = rng.integers(0, D, size=M)
    elif dist == "zipf":
        d = (rng.zipf(1.3, size=M) - 1) % D
    elif dist == "sorted":
        d = np.sort(rng.integers(0, D, size=M))
    elif dist == "const":
        d = np.zeros(M, dtype=int)
    # stable counting-sort dest
    order_idx = np.argsort(d, kind="stable")       # src for each output slot
    dest = np.empty(M, dtype=np.int64)
    dest[order_idx] = np.arange(M)
    delta = (dest - np.arange(M)) % M
    pos = np.arange(M)
    bits = int(np.log2(M))
    rounds = range(bits) if order == "lsb" else range(bits - 1, -1, -1)
    maxocc_all = 1
    for j in rounds:
        move = (delta >> j) & 1
        newpos = np.where(move, (pos + (1 << j)) % M, pos)
        occ = np.bincount(newpos, minlength=M)
        maxocc_all = max(maxocc_all, occ.max())
        if occ.max() > 1:
            return maxocc_all  # conflict
        pos = newpos
        delta = delta - (move << j)
    assert np.all(delta % M == 0)
    return maxocc_all

for M in (1 << 10, 1 << 13):
    for D in (2, 16, 256):
        for dist in ("uniform", "zipf", "sorted", "const"):
            for order in ("lsb", "msb"):
                occs = [test(M, D, dist, order, seed=s) for s in range(3)]
                print(f"M={M} D={D:3d} {dist:8s} {order}: max occupancy {max(occs)}")
