"""Registry-shadowing guard: every query-family module updates the
shared ``queries.QUERIES`` / ``queries.ORACLE_SQL`` dicts on import, so
a duplicated name silently REPLACES an (often driver-certified) query.
This test makes that class of bug loud: family dicts must be pairwise
disjoint AND disjoint from the names registered directly in
queries.py's own source (parsed via ast, so the check sees the base
names even after the updates have happened)."""

import ast
import os

import pdf_oxide_ray.queries as q

_FAMILIES = [
    ("queries_analytic", "ANALYTIC_QUERIES"),
    ("queries_relational", "RELATIONAL_QUERIES"),
    ("queries_relational2", "RELATIONAL2_QUERIES"),
    ("queries_corpus", "CORPUS_QUERIES"),
    ("queries_curation", "CURATION_QUERIES"),
    ("queries_curation2", "CURATION2_QUERIES"),
    ("queries_curation3", "CURATION3_QUERIES"),
    ("queries_curation4", "CURATION4_QUERIES"),
    ("queries_curation5", "CURATION5_QUERIES"),
    ("queries_curation6", "CURATION6_QUERIES"),
    ("queries_curation7", "CURATION7_QUERIES"),
    ("queries_curation8", "CURATION8_QUERIES"),
    ("queries_curation9", "CURATION9_QUERIES"),
    ("queries_curation10", "CURATION10_QUERIES"),
    ("queries_curation11", "CURATION11_QUERIES"),
    ("queries_curation12", "CURATION12_QUERIES"),
    ("queries_curation13", "CURATION13_QUERIES"),
    ("queries_curation14", "CURATION14_QUERIES"),
    ("queries_curation15", "CURATION15_QUERIES"),
    ("queries_curation16", "CURATION16_QUERIES"),
    ("queries_curation17", "CURATION17_QUERIES"),
    ("queries_curation18", "CURATION18_QUERIES"),
    ("queries_curation19", "CURATION19_QUERIES"),
    ("queries_curation20", "CURATION20_QUERIES"),
    ("queries_curation21", "CURATION21_QUERIES"),
]


def _base_names() -> set:
    """Names queries.py registers itself: literal keys of the QUERIES
    dict plus QUERIES["name"] = ... item assignments."""
    src = open(os.path.join(os.path.dirname(q.__file__),
                            "queries.py")).read()
    names: set = set()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if (isinstance(t, ast.Name) and t.id == "QUERIES"
                        and isinstance(node.value, ast.Dict)):
                    names |= {k.value for k in node.value.keys
                              if isinstance(k, ast.Constant)}
                if (isinstance(t, ast.Subscript)
                        and isinstance(t.value, ast.Name)
                        and t.value.id == "QUERIES"
                        and isinstance(t.slice, ast.Constant)):
                    names.add(t.slice.value)
    assert names, "parse found no base registrations — test is broken"
    return names


def test_family_registrations_are_disjoint():
    import importlib

    owners: dict[str, str] = {n: "queries.py" for n in _base_names()}
    clashes = []
    for mod_name, dict_name in _FAMILIES:
        mod = importlib.import_module(f"pdf_oxide_ray.{mod_name}")
        for name in getattr(mod, dict_name):
            if name in owners:
                clashes.append(f"{name}: {owners[name]} vs {mod_name}")
            else:
                owners[name] = mod_name
    assert not clashes, "shadowed registrations: " + "; ".join(clashes)
    # and the merged registry saw every name exactly once
    assert set(owners) == set(q.QUERIES), (
        set(owners) ^ set(q.QUERIES))
