"""Every registry query must carry a real docstring — the round-10/11
defect class where ``\"\"\"...\"\"\".format(...)`` silently turned the
docstring into a discarded expression (__doc__ None) hit 195 of 602
queries before the whole-class fix. This pin keeps it closed: a new
wave that reintroduces the pattern fails here immediately.
"""

from __future__ import annotations

import re


def test_every_query_has_a_docstring():
    from etl_poor_main_pipeline_spark.registry import REGISTRY, queries

    # walk the same merged registry queries() serves
    import glob
    import importlib

    missing: list[str] = []
    unformatted: list[str] = []
    seen = 0
    mods = [("", REGISTRY)]
    for f in sorted(
        glob.glob("etl_poor_main_pipeline_spark/registry_ext*.py")
    ):
        name = f.split("/")[-1][:-3]
        num = name.replace("registry_ext", "")
        mod = importlib.import_module(
            f"etl_poor_main_pipeline_spark.{name}"
        )
        reg = getattr(mod, "REGISTRY_EXT" + num, None)
        if reg:
            mods.append((name, reg))
    for _, reg in mods:
        for qname, spec in reg.items():
            seen += 1
            doc = spec.fn.__doc__
            if not doc or len(doc.strip()) < 20:
                missing.append(qname)
            elif re.search(r"\{[a-z_0-9]+\}", doc):
                unformatted.append(qname)
    assert seen >= len(queries()), "registry walk missed modules"
    assert not missing, (
        f"{len(missing)} queries lack a docstring (a string literal"
        f" followed by .format() is an expression, not a docstring;"
        f" assign fn.__doc__ after the def instead): {missing[:10]}"
    )
    assert not unformatted, (
        f"{len(unformatted)} docstrings contain unformatted"
        f" {{placeholders}}: {unformatted[:10]}"
    )
