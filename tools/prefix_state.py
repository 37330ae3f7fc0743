"""Machine-check the registry-prefix rotation (VERDICT r6 #8).

The driver's CORRECTNESS gate verifies only the FIRST 50 ``queries()``
entries each round, so the rotation — which entries sit in that
checked prefix — is the highest-stakes manual step per round. This
module turns the rotation rule into data so a pytest
(tests/test_rotation_guard.py) can enforce it:

RULE (the ``queries()`` docstring contract, judged every round):
  1. every entry whose query function changed since its LAST driver
     check must be in the live prefix (plus entries never checked,
     and entries whose latest driver row is red);
  2. every operator module changed since the last baseline must have
     at least one referencing entry in the prefix (the judge's
     module-granularity check);
  3. the backlog slots promote OLDEST-first — no unchanged prefix
     entry may be fresher (later last-checked round) than a parked
     entry it displaced.

State lives in ``tools/prefix_baseline.json``:
  - ``entries``: per entry, the md5 of its ``_q_*`` function source
    AS OF its last driver check (or pending current-round check for
    prefix entries), plus that round number;
  - ``modules``: md5 per ceres_spark source file at baseline time.

Maintenance protocol (enforced, not optional): at round end, AFTER
the prefix list is final, run ``python tools/prefix_state.py regen``.
regen restamps ONLY live-prefix entries (current hash, pending
round = max known round + 1) and carries parked entries' recorded
hashes forward UNCHANGED — so editing a parked entry without
promoting it makes the guard fail, which is the point.

CLI:
  python tools/prefix_state.py check   # what the pytest runs
  python tools/prefix_state.py regen   # restamp prefix entries
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "tools", "prefix_baseline.json")
PREFIX_LEN = 50


def _md5(text: str | bytes) -> str:
    if isinstance(text, str):
        text = text.encode()
    return hashlib.md5(text).hexdigest()


def last_checked_rounds() -> dict[str, tuple[int, bool]]:
    """{entry: (latest round with a driver row, latest row green)}.
    Green = hash/rows matched, or a rows-only row with spark_rows
    recorded (the driver's weaker by-design check)."""
    out: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            if row.get("err") == "no_oracle":
                green = row.get("spark_rows") is not None
            else:
                green = (
                    row.get("err") in (None, "")
                    and row.get("rows_match") is not False
                    and row.get("schema_match") is not False
                    and row.get("hash_match") is not False
                )
            out[name] = (rnd, bool(green))
    return out


def entry_sources() -> dict[str, str]:
    """{entry: source text of its queries() callable}."""
    import __spark_entry__ as entrymod

    return {
        name: inspect.getsource(fn)
        for name, fn in entrymod.queries().items()
    }


def live_prefix() -> list[str]:
    import __spark_entry__ as entrymod

    return list(entrymod.queries())[:PREFIX_LEN]


def module_files() -> dict[str, str]:
    """{repo-relative path: md5} for every ceres_spark source file."""
    out = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "ceres_spark", "**", "*.py"),
                  recursive=True)
    ):
        rel = os.path.relpath(path, REPO)
        out[rel] = _md5(open(path, "rb").read())
    return out


#: Modules NO registry entry can exercise — the SURVEY §5 split's
#: SQL-inexpressible / driver-facing surface whose correctness gate
#: is pytest, not the driver oracle (tree walk/caches/maintenance →
#: test_tree/test_maintenance; CLI → test_cli; exception classes →
#: test_errors; session bootstrap runs under every test). The
#: changed-module rule consults this list LAST: a changed module that
#: no entry reaches and that is not listed here is still a violation,
#: so a new uncovered module forces a deliberate decision instead of
#: silently rotting (added r9 when tree.py changed with no reachable
#: entry).
PYTEST_ONLY_MODULES = frozenset({
    "ceres_spark/__init__.py",
    "ceres_spark/cli.py",              # test_cli
    "ceres_spark/errors.py",           # test_errors (exception surface)
    "ceres_spark/session.py",          # bootstraps every test session
    "ceres_spark/tree.py",             # test_tree/test_maintenance —
    #                                    fs-level ops, SQL-inexpressible
    "ceres_spark/timeseries.py",       # test_series_ops merge scenarios
    "ceres_spark/sources/txn_log.py",  # tree.store's put-if-absent log
    #                                    (test_tree); the replay twin
    #                                    checks the WRITE SEMANTICS via
    #                                    stream_store_replay, not this
    #                                    driver-side log helper
    "ceres_spark/sources/slice_datasource.py",  # Spark DataSource
    #                                    wrapper (test_slice_datasource);
    #                                    the underlying codec IS
    #                                    entry-reachable via
    #                                    slice_format/slice_roundtrip
    "ceres_spark/operators/codec_contract.py",  # the vendor
    #                                    conformance KIT — a test
    #                                    harness by nature
    #                                    (test_codec_contract,
    #                                    test_vendor_walkthrough)
    "ceres_spark/operators/__init__.py",
    "ceres_spark/plans/__init__.py",
    "ceres_spark/sources/__init__.py",
    "ceres_spark/streaming/__init__.py",
})


def _internal_imports() -> dict[str, set[str]]:
    """{ceres_spark file: ceres_spark files it imports} — one text
    pass, import statements only."""
    mods = set(module_files())
    out: dict[str, set[str]] = {}
    pat = re.compile(
        r"^\s*(?:import|from)\s+(ceres_spark(?:\.\w+)*)", re.M
    )
    for rel in mods:
        src = open(os.path.join(REPO, rel)).read()
        deps = set()
        for dotted in pat.findall(src):
            cand = dotted.replace(".", os.sep) + ".py"
            if cand in mods:
                deps.add(cand)
        out[rel] = deps
    return out


def entry_module_refs() -> dict[str, set[str]]:
    """{entry: repo-relative ceres_spark files its query function
    references}, via the import-alias names used in the entry source
    (the entry functions call through module aliases like ``ana.`` /
    ``sk.`` / ``tbl.``), CLOSED transitively over ceres_spark-internal
    imports — an entry that runs catalog.find exercises plans/glob.py
    through it, so a glob.py change is covered by promoting that
    entry (r9: the alias-only mapping left catalog's helper modules
    invisible to the changed-module rule)."""
    import __spark_entry__ as entrymod

    alias_to_file: dict[str, str] = {}
    for alias, obj in vars(entrymod).items():
        mod = inspect.getmodule(obj) if not inspect.ismodule(obj) else obj
        if mod is None:
            continue
        f = getattr(mod, "__file__", None)
        if f and os.path.abspath(f).startswith(
            os.path.join(REPO, "ceres_spark")
        ):
            alias_to_file[alias] = os.path.relpath(os.path.abspath(f), REPO)
    internal = _internal_imports()

    def closure(seed: set[str]) -> set[str]:
        todo, seen = list(seed), set(seed)
        while todo:
            for dep in internal.get(todo.pop(), ()):
                if dep not in seen:
                    seen.add(dep)
                    todo.append(dep)
        return seen

    refs: dict[str, set[str]] = {}
    for name, src in entry_sources().items():
        used = set()
        for alias, rel in alias_to_file.items():
            if re.search(rf"\b{re.escape(alias)}\s*\.", src):
                used.add(rel)
        refs[name] = closure(used)
    return refs


def check(baseline: dict | None = None) -> list[str]:
    """Return a list of rotation-rule violations (empty == clean)."""
    if baseline is None:
        if not os.path.exists(BASELINE):
            return [f"missing {os.path.relpath(BASELINE, REPO)} — "
                    "run `python tools/prefix_state.py regen`"]
        baseline = json.load(open(BASELINE))
    problems: list[str] = []
    prefix = set(live_prefix())
    sources = entry_sources()
    rounds = last_checked_rounds()
    base_entries = baseline.get("entries", {})

    # 1a. changed-since-last-check entries must be in the prefix
    for name, src in sources.items():
        rec = base_entries.get(name)
        if name in prefix:
            continue
        if rec is None:
            problems.append(f"{name}: never baselined/checked but parked")
        elif rec["qfn_md5"] != _md5(src):
            problems.append(
                f"{name}: query fn changed since its r{rec['round']} "
                "check but is parked outside the prefix"
            )
    # 1b. red latest driver row must stay in the prefix
    for name, (rnd, green) in rounds.items():
        if not green and name in sources and name not in prefix:
            problems.append(
                f"{name}: latest driver row (r{rnd}) is RED but parked"
            )
    # 2. changed modules need a referencing entry in the prefix —
    # except the documented pytest-only surface no entry can reach
    base_modules = baseline.get("modules", {})
    refs = entry_module_refs()
    reachable = set().union(*refs.values()) if refs else set()
    for rel, h in module_files().items():
        if base_modules.get(rel) == h:
            continue
        covering = [
            e for e in prefix if rel in refs.get(e, ())
        ]
        if covering:
            continue
        if rel in PYTEST_ONLY_MODULES and rel not in reachable:
            continue  # SURVEY §5 split: pytest is this file's gate
        problems.append(
            f"{rel}: changed since baseline with no referencing "
            "entry in the prefix"
            + (" (and unreachable by ANY entry — add it to "
               "PYTEST_ONLY_MODULES deliberately or wire an entry)"
               if rel not in reachable else "")
        )
    # 3. oldest-first: no unchanged prefix-backlog entry fresher than
    # a parked entry (ties allowed; unchecked/new entries exempt)
    backlog_rounds = [
        rounds[e][0]
        for e in prefix
        if e in rounds
        and e in base_entries
        and base_entries[e].get("qfn_md5") == _md5(sources.get(e, ""))
        and base_entries[e].get("round") != baseline.get("pending_round")
    ]
    parked_rounds = [
        rounds[e][0] for e in sources if e not in prefix and e in rounds
    ]
    if backlog_rounds and parked_rounds:
        if max(backlog_rounds) > min(parked_rounds):
            problems.append(
                f"oldest-first violated: prefix backlog contains an "
                f"r{max(backlog_rounds)} entry while an "
                f"r{min(parked_rounds)} entry is parked"
            )
    return problems


def regen() -> dict:
    """Restamp the baseline: prefix entries get current hashes and
    the pending round; parked entries keep their recorded state (or
    are bootstrapped at their last driver round if absent — first
    run only)."""
    old = (
        json.load(open(BASELINE)) if os.path.exists(BASELINE) else {}
    )
    old_entries = old.get("entries", {})
    sources = entry_sources()
    rounds = last_checked_rounds()
    pending = max((r for r, _ in rounds.values()), default=0) + 1
    prefix = set(live_prefix())
    entries = {}
    for name, src in sources.items():
        if name in prefix:
            entries[name] = {"round": pending, "qfn_md5": _md5(src)}
        elif name in old_entries:
            entries[name] = old_entries[name]
        else:  # bootstrap: parked + never baselined — record as-is at
            # its last driver round (valid only while the working tree
            # matches what that round checked; true at first regen)
            entries[name] = {
                "round": rounds.get(name, (0, False))[0],
                "qfn_md5": _md5(src),
            }
    state = {
        "pending_round": pending,
        "entries": entries,
        "modules": module_files(),
    }
    with open(BASELINE, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    return state


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    if cmd == "regen":
        st = regen()
        print(
            f"baseline restamped: {len(st['entries'])} entries, "
            f"pending round r{st['pending_round']:02d}, "
            f"{len(st['modules'])} module hashes"
        )
    else:
        probs = check()
        for p in probs:
            print("VIOLATION:", p)
        print("clean" if not probs else f"{len(probs)} violation(s)")
        sys.exit(1 if probs else 0)
