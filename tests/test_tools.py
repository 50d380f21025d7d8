"""Pure-Python guarantees of tools/gen_scaled.py — the derived
scale-point generator. These properties are load-bearing for the
scaling measurements in BENCH_SCALING.json: a collision in any of the
three per-replica schemes silently changes the corpus's duplicate
density and the measured ratios stop meaning what SCALE.md says they
mean (both collision classes were actually hit and fixed during
round 8: vowel-rotation period 5 at factor 10, and an MDS/Hamming tag
code whose LEVENSHTEIN distance was only 2)."""

from __future__ import annotations

import importlib.util
import os


def _load_gen_scaled():
    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "tools", "gen_scaled.py"
    )
    spec = importlib.util.spec_from_file_location("gen_scaled", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestScaledGenerator:
    def test_tags_pairwise_levenshtein_at_least_3(self):
        gs = _load_gen_scaled()
        tags = gs._TAGS
        assert len(tags) >= 110 and len(set(tags)) == len(tags)
        bad = [
            (a, b)
            for i, a in enumerate(tags)
            for b in tags[i + 1 :]
            if gs._lev(a, b) < 3
        ]
        assert not bad, bad[:5]

    def test_text_transforms_distinct_for_125_replicas(self):
        # the transform is a charwise substitution; its action on the
        # cycled alphabet determines it completely
        gs = _load_gen_scaled()
        probe = "aeiou bcdfg lmnpr"

        def apply(i: int) -> str:
            # mirror _rot_vowels' translate tables in pure python
            def cyc(alpha, power):
                p = power % len(alpha)
                return alpha[p:] + alpha[:p]

            src = "aeiou" + "bcdfg" + "lmnpr"
            dst = cyc("aeiou", i) + cyc("bcdfg", i // 5) + cyc("lmnpr", i // 25)
            return probe.translate(str.maketrans(src, dst)) if i else probe

        outs = [apply(i) for i in range(125)]
        assert len(set(outs)) == 125

    def test_embedding_masks_distinct_below_143(self):
        def mask(i: int) -> tuple:
            return tuple(
                (((i * 7 + j) % 11) < 5) != (((i * 5 + j) % 13) < 6)
                for j in range(64)
            )

        masks = [mask(i) for i in range(1, 143)]
        assert len(set(masks)) == len(masks)
