"""Normalized diff of two dumped plan files (tools/dump_plans.py output).

Usage: python tools/plan_normdiff.py BEFORE.txt AFTER.txt

Strips session-dependent tokens so only structural differences remain:
expression IDs (``#123``/``#123L``), codegen span ids (``*(7)`` and
``[codegen id : 7]``), plan ids, cached-RDD numbers and the
``named_struct``/``struct`` pretty-printer synonym (same expression,
two renderings — Spark prints CreateNamedStruct either way depending
on how the tree was built).  Exit status 0 = structurally identical,
1 = real diff (printed unified).
"""
import difflib
import re
import sys


def normalize(text: str) -> str:
    t = re.sub(r"#\d+L?", "#x", text)
    t = re.sub(r"\*\(\d+\)", "*(n)", t)
    t = re.sub(r"\[codegen id : \d+\]", "[codegen id : n]", t)
    t = re.sub(r"\[plan_id=\d+\]", "[plan_id=n]", t)
    t = re.sub(r"CachedRDDBuilder\([^)]*\)", "CachedRDDBuilder(...)", t)
    t = re.sub(r"InMemoryRelation \[[^\]]*\]", "InMemoryRelation [...]", t)
    t = re.sub(r"\bnamed_struct\(", "struct(", t)
    # lambda-bound variable names are alpha-equivalent: the Column API
    # gensyms (x_67), SQL text keeps the source names (x, acc, v)
    t = re.sub(r"\blambda [A-Za-z_][A-Za-z0-9_]*#x", "lambda v#x", t)
    # subquery/CTE ids and exchange coordinator ids drift per session
    t = re.sub(r"Subquery subquery#x, \[id=#?\d*\]", "Subquery subquery#x", t)
    t = re.sub(r"\[id=#\d+\]", "[id=#n]", t)
    return t


def main() -> int:
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
