"""K7 orchestration stub (scripts/run_mapboxing.py): EP3 export → sources →
recipe → rendered upload plan, without any network access (parity with
reference run_mapboxing.bash:12-76, whose TESTING gate also skips uploads)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from run_mapboxing import build_upload_plan  # noqa: E402


def test_upload_plan_from_ndjson_export(spark, ates_catalog, tmp_path):
    from database2ogr_spark.plans.area_export import TABLE_ORDER, export_ndjson

    out = str(tmp_path)
    dirs = export_ndjson(ates_catalog, out, 1)
    plan = build_upload_plan(dirs, "u1", "ates_test", out)

    assert plan["tileset_id"] == "u1.ates_test"
    assert {s["name"] for s in plan["sources"]} == set(TABLE_ORDER)
    for s in plan["sources"]:
        assert s["files"], f"no part files exported for {s['name']}"

    with open(plan["recipe_path"], encoding="utf-8") as fh:
        recipe = json.load(fh)
    assert recipe["name"] == "ates_test"
    assert set(recipe["recipe"]["layers"]) == set(TABLE_ORDER)
    for layer in recipe["recipe"]["layers"].values():
        assert layer["source"].startswith("mapbox://tileset-source/u1/")

    with open(plan["plan_path"], encoding="utf-8") as fh:
        script = fh.read()
    # one upload per part file + check per source + validate/create/publish
    n_files = sum(len(s["files"]) for s in plan["sources"])
    assert script.count("curl -X POST") == n_files + 2  # +create +publish
    assert "validateRecipe" in script
    assert "/publish?" in script
    # dry-run artifact only — the token is a shell placeholder, never a value
    assert "$MAPBOX_TOKEN" in script
