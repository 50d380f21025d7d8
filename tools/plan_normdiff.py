"""Normalized diff of two dumped plan files (tools/dump_plans.py output).

Usage: python tools/plan_normdiff.py BEFORE.txt AFTER.txt

Strips session-dependent tokens so only structural differences remain,
WITHOUT erasing identity (ADVICE r18: collapsing every expression id
to one token equated ``(a#1 = a#2)`` with ``(a#1 = a#1)`` and
``(x,y)->x-y`` with ``(x,y)->y-x`` — a normalizer that can silently
eat a real structural diff):

- expression ids are RENUMBERED by first appearance (``#123`` →
  ``#e0``, next distinct id → ``#e1``, …) — two structurally identical
  plans produce the same sequence regardless of the session's raw
  counter values, while distinct ids stay distinct;
- lambda variable NAMES are alpha-renamed to ``v`` but keep their
  (renumbered) id, so binding structure survives (the Column API
  gensyms ``x_67``, SQL text keeps source names);
- codegen span ids, plan ids, exchange/subquery ``[id=…]`` tags,
  ``MapPartitionsRDD[n]`` numbers and cached-RDD builder tails are
  blanked (pure session counters);
- ``named_struct``/``struct`` pretty-printer synonym unified (same
  expression, two renderings).

Exit status 0 = structurally identical, 1 = real diff (printed
unified).
"""
import difflib
import re
import sys


def normalize(text: str) -> str:
    # session-counter tags normalized FIRST, while raw digits still
    # exist (the exprId pass below rewrites every remaining "#<digits>")
    t = re.sub(r"\[id=#?\d+\]", "[id=n]", text)
    t = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[n]", t)
    t = re.sub(r"\*\(\d+\)", "*(n)", t)
    t = re.sub(r"\[codegen id : \d+\]", "[codegen id : n]", t)
    t = re.sub(r"\[plan_id=\d+\]", "[plan_id=n]", t)
    # the builder arg embeds nested parens (StorageLevel(...), the
    # serialized plan) and session-dependent object addresses — blank
    # to end of line rather than truncating at the first ')'
    t = re.sub(r"CachedRDDBuilder\(.*", "CachedRDDBuilder(...)", t)
    t = re.sub(r"InMemoryRelation \[[^\]]*\]", "InMemoryRelation [...]", t)
    t = re.sub(r"\bnamed_struct\(", "struct(", t)
    # exprIds: renumber by first appearance — identity-preserving
    ids: dict[str, int] = {}

    def renumber(m: re.Match) -> str:
        raw = m.group(1)
        if raw not in ids:
            ids[raw] = len(ids)
        return f"#e{ids[raw]}{m.group(2)}"

    t = re.sub(r"#(\d+)(L?)", renumber, t)
    # lambda variables are alpha-equivalent BY NAME only; the
    # (renumbered) id carries the binding, so renaming to 'v' keeps
    # swapped-operand / distinct-variable diffs visible
    t = re.sub(r"\blambda [A-Za-z_][A-Za-z0-9_]*#e", "lambda v#e", t)
    return t


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = normalize(open(a_path).read()).splitlines()
    b = normalize(open(b_path).read()).splitlines()
    diff = list(difflib.unified_diff(a, b, a_path, b_path, lineterm=""))
    if not diff:
        print("IDENTICAL (normalized)")
        return 0
    print("\n".join(diff))
    return 1


if __name__ == "__main__":
    sys.exit(main())
