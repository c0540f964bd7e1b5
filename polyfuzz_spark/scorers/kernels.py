"""From-scratch pair-scoring kernels (engine scalar functions K2/K3).

Reimplementations of the public rapidfuzz/jellyfish algorithm family used by
the reference (``/root/reference/polyfuzz/models/_rapidfuzz.py:48`` WRatio
default, ``_distance.py:32`` fuzz.ratio default, docs list the full fuzz.*
option set). rapidfuzz is not installed here; formulas follow the published
algorithm descriptions (Indel = Levenshtein with substitution cost 2;
WRatio composite per the public rapidfuzz spec; Jaro-Winkler per the
standard definition, validated against DuckDB's jaro_winkler_similarity).

The DP kernels are bit-parallel over Python big ints (Myers 1999 for
Levenshtein, Allison–Dix 1986 for LCS — the same published cores rapidfuzz
uses): one O(⌈m/64⌉)-word step per text character instead of a length-m DP
row. On this engine's short match keys (≤ ~80 chars) that is 8–20× faster
per call than a numpy row DP (measured interleaved, 4k random pairs:
Levenshtein 410→37 µs, LCS 237→13 µs), which is what bounds the
pandas-UDF ratio/WRatio scan throughput. All ratio-family scores are 0–100
like rapidfuzz (callers rescale); jaro/jaro_winkler are 0–1.
"""

from __future__ import annotations


def _match_masks(a: str) -> dict[str, int]:
    """char → bitmask of its positions in ``a`` (bit i ⇔ a[i] == char)."""
    pm: dict[str, int] = {}
    bit = 1
    for ch in a:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    return pm


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (oracle: DuckDB ``levenshtein``).

    Myers' bit-vector algorithm: vertical delta of the DP column kept as
    positive/negative bit masks, one constant number of word ops per char
    of ``b`` (arbitrary-precision ints make the multi-word case free)."""
    if a == b:
        return 0
    m = len(a)
    if m == 0 or len(b) == 0:
        return max(m, len(b))
    pm = _match_masks(a)
    mask = (1 << m) - 1
    high = 1 << (m - 1)
    pv, mv, score = mask, 0, m
    get = pm.get
    for ch in b:
        eq = get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & high:
            score += 1
        if mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


def lcs_length(a: str, b: str) -> int:
    """Longest common subsequence length.

    Allison–Dix bit-string LCS: row kept as a bit string S (0-bit ⇔ a
    match consumed), per char of ``b``: u = S & PM[c]; S = (S+u) | (S−u).
    LCS = zero bits of the final S."""
    la = len(a)
    if la == 0 or len(b) == 0:
        return 0
    pm = _match_masks(a)
    mask = (1 << la) - 1
    s = mask
    get = pm.get
    for ch in b:
        u = s & get(ch, 0)
        s = ((s + u) | (s - u)) & mask
    return la - s.bit_count()


def indel_distance(a: str, b: str) -> int:
    """Levenshtein with substitutions forbidden = la + lb - 2·LCS."""
    return len(a) + len(b) - 2 * lcs_length(a, b)


def ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.ratio``: normalized Indel similarity × 100."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 100.0 * (1.0 - indel_distance(a, b) / total)


def _matching_windows(short: str, long: str) -> list[int]:
    """Candidate window offsets in ``long`` for partial_ratio: every offset
    where some character of ``short`` first aligns (greedy block heuristic,
    fuzzywuzzy-style) plus the ends."""
    offsets = {0, max(0, len(long) - len(short))}
    sc = set(short)
    for j, cl in enumerate(long):
        if cl in sc:
            offsets.add(min(j, len(long) - len(short)))
    return sorted(o for o in offsets if o >= 0)


def partial_ratio(a: str, b: str) -> float:
    """Best fuzz.ratio of the shorter string vs any same-length window of
    the longer (public partial-alignment semantics; window candidates from a
    block heuristic rather than an exhaustive slide)."""
    if not a or not b:
        return 100.0 if a == b else 0.0
    short, long = (a, b) if len(a) <= len(b) else (b, a)
    if len(short) == len(long):
        return ratio(short, long)
    best = 0.0
    for off in _matching_windows(short, long):
        window = long[off : off + len(short)]
        r = ratio(short, window)
        if r > best:
            best = r
            if best == 100.0:
                break
    return best


def _tokens(s: str) -> list[str]:
    return sorted(s.split())


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(" ".join(_tokens(a)), " ".join(_tokens(b)))


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    if not ta and not tb:
        return 100.0
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(ratio(inter, sa), ratio(inter, sb), ratio(sa, sb))


def token_ratio(a: str, b: str) -> float:
    return max(token_sort_ratio(a, b), token_set_ratio(a, b))


def partial_token_ratio(a: str, b: str) -> float:
    return max(
        partial_ratio(" ".join(_tokens(a)), " ".join(_tokens(b))),
        partial_token_set_ratio(a, b),
    )


def partial_token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    if ta & tb:
        return 100.0
    return partial_ratio(
        " ".join(sorted(ta)), " ".join(sorted(tb))
    )


def wratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.WRatio`` composite (public spec):

        len_ratio < 1.5 → max(ratio, token_ratio·0.95)
        else, scale = 0.9 (len_ratio < 8) or 0.6
             → max(ratio, partial_ratio·scale, partial_token_ratio·0.95·scale)
    """
    if not a or not b:
        return 0.0
    la, lb = len(a), len(b)
    len_ratio = max(la, lb) / min(la, lb)
    end = ratio(a, b)
    if len_ratio < 1.5:
        return max(end, token_ratio(a, b) * 0.95)
    scale = 0.9 if len_ratio < 8 else 0.6
    return max(
        end,
        partial_ratio(a, b) * scale,
        partial_token_ratio(a, b) * 0.95 * scale,
    )


def qratio(a: str, b: str) -> float:
    if not a or not b:
        return 0.0
    return ratio(a, b)


def jaro(a: str, b: str) -> float:
    """Jaro similarity, 0–1 (standard definition)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0  # DuckDB/Apache-Commons convention: empty → 0, even '' vs ''
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    # greedy match phase via per-char position masks: avail[c] holds the
    # unused positions of c in b; "first unused j in window" is the lowest
    # set bit of the window slice — O(1) big-int ops per char of a instead
    # of an O(window) scan (measured 2× on ≤80-char keys, exact)
    avail = _match_masks(b)
    seq_a: list[str] = []
    matched_j: list[int] = []
    for i, ca in enumerate(a):
        m = avail.get(ca)
        if not m:
            continue
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        x = ((m >> lo) << lo) & ((1 << hi) - 1)
        if x:
            j_bit = x & -x
            avail[ca] = m ^ j_bit
            seq_a.append(ca)
            matched_j.append(j_bit.bit_length() - 1)
    matches = len(seq_a)
    if matches == 0:
        return 0.0
    seq_b = [b[j] for j in sorted(matched_j)]
    # classic transposition count: differing aligned positions, halved with
    # INTEGER division (Apache-Commons/DuckDB behavior)
    t = sum(x != y for x, y in zip(seq_a, seq_b)) // 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def monge_elkan(a: str, b: str) -> float:
    """Monge–Elkan hybrid similarity, 0–1 (Monge & Elkan, KDD 1996): the
    mean over a's whitespace tokens of the best Jaro-Winkler match among
    b's tokens — the classic scorer for multi-token names where tokens
    align out of order ('red widget' vs 'widget, red-ish'). Asymmetric by
    definition (a is the query side); callers wanting symmetry take
    max(me(a,b), me(b,a)).

    Oracle twin (DuckDB, bit-exact — sequential sum in list order both
    sides): ``list_avg(list_transform(string_split(a,' '), ta ->
    list_max(list_transform(string_split(b,' '), tb ->
    jaro_winkler_similarity(ta, tb)))))``. NOTE: DuckDB's string_split
    keeps empty tokens from repeated spaces; inputs are single-spaced in
    the contract queries (and ``str.split()`` here drops empties — the
    twin holds on single-spaced text).
    """
    ta = a.split()
    if not ta:
        return 0.0
    tb = b.split()
    if not tb:
        return 0.0
    total = 0.0
    for x in ta:
        total += max(jaro_winkler(x, y) for y in tb)
    return total / len(ta)


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler, 0–1 (oracle: DuckDB ``jaro_winkler_similarity``)."""
    j = jaro(a, b)
    if j <= boost_threshold:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1.0 - j)


# registry used by matchers / queries (all 0–100 except jaro family)
RATIO_KERNELS = {
    "ratio": ratio,
    "partial_ratio": partial_ratio,
    "token_sort_ratio": token_sort_ratio,
    "token_set_ratio": token_set_ratio,
    "token_ratio": token_ratio,
    "partial_token_ratio": partial_token_ratio,
    "WRatio": wratio,
    "QRatio": qratio,
}
