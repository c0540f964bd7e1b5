"""Adversarial pair generator for the WRatio/partial_ratio fuzz corpus
(VERDICT r03 item 8). Deterministic (seeded) so the SAME pairs regenerate
everywhere; the expected scores are FROZEN in
``tests/data/wratio_golden_frozen.json`` — kernel regressions surface as
exact diffs against that file, not as silent recall drift in downstream
matchers.

Pair classes target the spots a window-heuristic composite can break:

* ``embed``      — the short string verbatim inside noise at a random
                   offset (partial_ratio must find the window: 100);
* ``midalign``   — the best alignment starts BEFORE the first matching
                   char (stresses the block-heuristic's offset set);
* ``boundary``   — length ratios straddling the 1.5 / 8.0 branch edges
                   (scale-factor selection bugs show up as ×0.9/×0.6
                   flips);
* ``unicode``    — same text re-expressed with full-width forms, combining
                   accents (NFC vs NFD), and CJK — code-point-length vs
                   display-width confusions change len() and every ratio;
* ``tokendup``   — duplicated/permuted token multisets (token_sort vs
                   token_set divergence).

Regenerating the frozen file after an INTENTIONAL kernel change:
    python -c "from tests.wratio_adversarial import refreeze; refreeze()"
then review the diff like any golden update.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

FROZEN = Path(__file__).parent / "data" / "wratio_golden_frozen.json"

_ASCII = "abcdefghijklmnopqrstuvwxyz"
_FULLWIDTH = {c: chr(ord(c) - ord("a") + 0xFF41) for c in _ASCII}
_CJK = "汉字漢字测试語言模型数据"
_COMBINING = "́̈̂"  # acute, diaeresis, circumflex


def _word(rng: random.Random, n: int, alphabet: str = _ASCII) -> str:
    return "".join(rng.choice(alphabet) for _ in range(n))


def generate_pairs(seed: int = 20260821) -> list[tuple[str, str, str]]:
    """[(kind, a, b)] — ~70 deterministic adversarial pairs."""
    rng = random.Random(seed)
    pairs: list[tuple[str, str, str]] = []

    # embed: short inside noise, offsets spread across the long string
    for i in range(12):
        short = _word(rng, rng.randint(3, 8))
        noise_l = _word(rng, rng.randint(0, 20))
        noise_r = _word(rng, rng.randint(0, 20))
        pairs.append(("embed", short, noise_l + short + noise_r))

    # midalign: long = x*k + short[1:] + ... so the best window aligns the
    # short string's TAIL; the first char of short never appears in long
    for i in range(10):
        short = _word(rng, rng.randint(4, 8))
        # strip the first char from the embedded copy and pad with a char
        # not in short so offset-by-first-match lands one off
        pad_pool = [c for c in _ASCII if c not in set(short)]
        pad = rng.choice(pad_pool) if pad_pool else "z"
        long = pad * rng.randint(1, 5) + short[1:] + pad * rng.randint(1, 5)
        pairs.append(("midalign", short, long))

    # boundary: |b| = ceil(1.5|a|) ± 1 and 8|a| ± 1 with shared prefix
    for i in range(8):
        a = _word(rng, rng.randint(4, 10))
        for mult, delta in ((1.5, -1), (1.5, 0), (1.5, 1), (8, -1), (8, 0),
                            (8, 1)):
            lb = max(len(a) + 1, int(len(a) * mult) + delta)
            b = a + _word(rng, lb - len(a))
            pairs.append(("boundary", a, b))
        if len(pairs) > 40:
            break

    # unicode: width/normalization variants of the same word
    for i in range(8):
        base = _word(rng, rng.randint(4, 10))
        full = "".join(_FULLWIDTH[c] for c in base)
        pairs.append(("unicode", base, full))
        accented = "".join(
            c + rng.choice(_COMBINING) if rng.random() < 0.4 else c
            for c in base
        )
        pairs.append(("unicode", base, accented))
        cjk_mix = base[: len(base) // 2] + "".join(
            rng.choice(_CJK) for _ in range(len(base) - len(base) // 2)
        )
        pairs.append(("unicode", base, cjk_mix))

    # tokendup: permuted + duplicated token multisets
    for i in range(8):
        toks = [_word(rng, rng.randint(2, 6)) for _ in range(rng.randint(2, 5))]
        a = " ".join(toks)
        shuffled = toks[:]
        rng.shuffle(shuffled)
        dups = shuffled + [rng.choice(toks)] * rng.randint(0, 2)
        pairs.append(("tokendup", a, " ".join(dups)))

    return pairs


def refreeze() -> None:
    """Recompute expected scores from the CURRENT kernels and overwrite the
    frozen file — run only after an intentional kernel change."""
    from polyfuzz_spark.scorers.kernels import partial_ratio, wratio

    rows = [
        {
            "kind": kind,
            "a": a,
            "b": b,
            "wratio": round(wratio(a, b), 9),
            "partial_ratio": round(partial_ratio(a, b), 9),
        }
        for kind, a, b in generate_pairs()
    ]
    FROZEN.parent.mkdir(exist_ok=True)
    FROZEN.write_text(json.dumps(rows, ensure_ascii=False, indent=1))
    print(f"froze {len(rows)} pairs -> {FROZEN}")
