"""Seeded mutation pass over the engine's pure functions — the
analog of the reference's mutmut gate (mutmut_config.py:1-16,
setup.cfg:76-84), scoped the same way: mutate only code whose
behavior a FAST, Spark-session-free test subset can adjudicate, so a
run costs minutes, not hours.

Targets (file, optional function whitelist):
- uri.py / jsonutil.py / filters.py — whole-file (pure codecs and
  dict filters; the reference's utils/filter.py is the ported twin)
- the rebuild-verdict rules (ivf/srp/screen/pq) — function-scoped
  (pure over collected report rows; thresholds are measured
  constants, exactly the kind of logic mutation testing is for)

Mutation operators: comparison swaps (< <-> <=, > <-> >=, == <-> !=),
and <-> or, + <-> -, numeric constant +1, True <-> False. Sites are
enumerated deterministically (file order, then line/col); when more
than MAX_MUTANTS exist, a seed-42 sample keeps the run bounded and
reproducible.

Each mutant is applied IN PLACE (original bytes restored in a
finally), and the kill suite runs in a subprocess: nonzero exit =
killed. Results go to stdout as a markdown table; surviving mutants
are triaged by hand into MUTATION.md.

Usage: python tools/mutate.py [--max N]
"""

from __future__ import annotations

import ast
import os
import random
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TARGETS = [
    ("aerovaldb_spark/uri.py", None),
    ("aerovaldb_spark/jsonutil.py", None),
    ("aerovaldb_spark/filters.py", None),
    (
        "aerovaldb_spark/operators/similarity.py",
        {"ivf_rebuild_verdict", "srp_rebuild_verdict", "_report_dict"},
    ),
    ("aerovaldb_spark/operators/text.py", {"screen_rebuild_verdict"}),
    ("aerovaldb_spark/operators/pq.py", {"pq_rebuild_verdict"}),
]

KILL_SUITE = [
    "tests/test_uri.py",
    "tests/test_mutation_boundaries.py",
    "tests/test_filters.py",
    "tests/test_rebuild_rules.py",
    "tests/test_pq.py::test_pq_rebuild_verdict_zero_baseline_floor",
    "tests/test_properties.py::test_encode_decode_inverse",
    "tests/test_properties.py::test_encoded_value_has_no_slash",
    "tests/test_properties.py::test_uri_roundtrip_any_route",
    "tests/test_properties.py::test_filter_heatmap_invariants",
    "tests/test_properties.py::test_json_dumps_always_valid_and_nan_free",
]

CMP_SWAP = {
    ast.Lt: ast.LtE, ast.LtE: ast.Lt,
    ast.Gt: ast.GtE, ast.GtE: ast.Gt,
    ast.Eq: ast.NotEq, ast.NotEq: ast.Eq,
}
SEED = 42
DEFAULT_MAX = 40


def _function_spans(tree, names):
    spans = []
    for node in ast.walk(tree):
        if (
            isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            and node.name in names
        ):
            spans.append((node.lineno, node.end_lineno))
    return spans


def _in_spans(node, spans):
    if spans is None:
        return True
    return any(a <= node.lineno <= b for a, b in spans)


def enumerate_sites(src: str, only_funcs) -> list[tuple]:
    """Deterministic (kind, lineno, col, detail) mutation sites."""
    tree = ast.parse(src)
    spans = (
        _function_spans(tree, only_funcs) if only_funcs else None
    )
    sites = []
    for node in ast.walk(tree):
        if not hasattr(node, "lineno") or not _in_spans(node, spans):
            continue
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            op = type(node.ops[0])
            if op in CMP_SWAP:
                sites.append(
                    ("cmp", node.lineno, node.col_offset, op.__name__)
                )
        elif isinstance(node, ast.BoolOp):
            sites.append(
                (
                    "boolop",
                    node.lineno,
                    node.col_offset,
                    type(node.op).__name__,
                )
            )
        elif isinstance(node, ast.BinOp) and isinstance(
            node.op, (ast.Add, ast.Sub)
        ):
            sites.append(
                (
                    "binop",
                    node.lineno,
                    node.col_offset,
                    type(node.op).__name__,
                )
            )
        elif (
            isinstance(node, ast.Constant)
            and isinstance(node.value, (int, float))
            and not isinstance(node.value, bool)
            and node.value not in (0,)  # 0 -> 1 flips too much dead init
        ):
            sites.append(
                ("const", node.lineno, node.col_offset, repr(node.value))
            )
        elif isinstance(node, ast.Constant) and isinstance(
            node.value, bool
        ):
            sites.append(
                ("bool", node.lineno, node.col_offset, repr(node.value))
            )
    return sorted(set(sites))


class _Mutator(ast.NodeTransformer):
    def __init__(self, site):
        self.kind, self.lineno, self.col, self.detail = site
        self.applied = False

    def _match(self, node):
        return (
            not self.applied
            and getattr(node, "lineno", None) == self.lineno
            and node.col_offset == self.col
        )

    def visit_Compare(self, node):
        self.generic_visit(node)
        if self.kind == "cmp" and self._match(node):
            node.ops = [CMP_SWAP[type(node.ops[0])]()]
            self.applied = True
        return node

    def visit_BoolOp(self, node):
        self.generic_visit(node)
        if self.kind == "boolop" and self._match(node):
            node.op = (
                ast.Or() if isinstance(node.op, ast.And) else ast.And()
            )
            self.applied = True
        return node

    def visit_BinOp(self, node):
        self.generic_visit(node)
        if self.kind == "binop" and self._match(node):
            node.op = (
                ast.Sub() if isinstance(node.op, ast.Add) else ast.Add()
            )
            self.applied = True
        return node

    def visit_Constant(self, node):
        if self.kind in ("const", "bool") and self._match(node):
            if repr(node.value) == self.detail:
                node.value = (
                    (not node.value)
                    if isinstance(node.value, bool)
                    else node.value + 1
                )
                self.applied = True
        return node


def mutated_source(src: str, site) -> str | None:
    tree = ast.parse(src)
    m = _Mutator(site)
    tree = m.visit(tree)
    if not m.applied:
        return None
    return ast.unparse(ast.fix_missing_locations(tree))


def run_suite() -> bool:
    """True when the kill suite PASSES (mutant survived). A hang is
    a kill: a mutant that flips a loop guard into non-termination
    changed behavior as surely as a wrong answer, and letting
    TimeoutExpired propagate would abort the whole run and lose the
    table (r14 review)."""
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", "-p",
             "no:cacheprovider", *KILL_SUITE],
            cwd=REPO,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=600,
        )
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0


def main() -> None:
    max_mutants = DEFAULT_MAX
    if "--max" in sys.argv:
        max_mutants = int(sys.argv[sys.argv.index("--max") + 1])

    all_sites = []
    for rel, funcs in TARGETS:
        src = open(os.path.join(REPO, rel)).read()
        for s in enumerate_sites(src, funcs):
            all_sites.append((rel, s))
    rng = random.Random(SEED)
    chosen = (
        sorted(rng.sample(all_sites, max_mutants))
        if len(all_sites) > max_mutants
        else all_sites
    )
    print(
        f"{len(all_sites)} sites across {len(TARGETS)} targets; "
        f"running {len(chosen)} mutants (seed {SEED})\n"
    )
    if not run_suite():
        raise SystemExit("kill suite is RED on the unmutated tree")

    print("| file | line | mutation | outcome |")
    print("|---|---|---|---|")
    killed = 0
    survivors = []
    for rel, site in chosen:
        path = os.path.join(REPO, rel)
        orig = open(path).read()
        mut = mutated_source(orig, site)
        if mut is None:
            continue
        t0 = time.time()
        try:
            open(path, "w").write(mut)
            ok = run_suite()
        finally:
            open(path, "w").write(orig)
        kind, lineno, _col, detail = site
        label = f"{kind}:{detail}"
        if ok:
            survivors.append((rel, lineno, label))
            out = "SURVIVED"
        else:
            killed += 1
            out = f"killed ({time.time() - t0:.0f}s)"
        print(f"| {rel} | {lineno} | {label} | {out} |", flush=True)
    total = killed + len(survivors)
    print(
        f"\nkill rate: {killed}/{total} "
        f"({killed / max(total, 1):.0%}); survivors: {len(survivors)}"
    )
    for rel, lineno, label in survivors:
        print(f"  SURVIVOR {rel}:{lineno} {label}")


if __name__ == "__main__":
    main()
