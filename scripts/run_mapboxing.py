"""K7 — tileset upload-orchestration driver (parity stub for the reference's
``run_mapboxing.bash:12-76``; SURVEY.md §2.10 declares the network half
out of engine scope).

Pipeline parity, step by step:

1. EP3 NDJSON export (the reference's ``runMapboxing mapboxing.js``,
   ``run_mapboxing.bash:3-10,70-72``) — runs distributed via
   ``plans.area_export.export_ndjson``.
2. One tileset *source* per exported table (``createSources``, ``:25-41``;
   source name = filename stem, X16).
3. Recipe JSON (``createRecipe`` → ``make-recipe.js``, ``:49-55``) via
   ``sinks.recipe.make_recipe`` (K6), written next to the export.
4. Tileset create + publish (``createTileset``/``publishTileset``,
   ``:57-68``).

Network steps are a DRY-RUN PLAN by default, mirroring the reference's own
``TESTING`` gate (``:34-38``): the script renders the exact HTTP requests
(method, URL, payload) it *would* make and writes them to
``<out_dir>/upload_plan.sh`` — it never opens a connection. Executing the
plan is a deliberate manual step with real credentials in a real shell.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

API = "https://api.mapbox.com/tilesets/v1"


def _curl(parts: list[str]) -> str:
    return " ".join(parts)


def build_upload_plan(
    ndjson_dirs: list[str], user: str, tileset_name: str, out_dir: str
) -> dict:
    """Steps 2-4: source uploads, recipe, tileset create+publish — returned
    as a plan dict and rendered to ``upload_plan.sh`` (dry-run artifact)."""
    from database2ogr_spark.sinks.recipe import make_recipe

    sources = []
    for d in sorted(ndjson_dirs):
        name = os.path.basename(d.rstrip("/")).split(".")[0]  # X16 stem
        parts = sorted(glob.glob(os.path.join(d, "part-*")))
        sources.append({"name": name, "files": parts})

    recipe = make_recipe(
        [s["name"] for s in sources], user, wrap_name=tileset_name
    )
    recipe_path = os.path.join(out_dir, "recipe.json")
    with open(recipe_path, "w", encoding="utf-8") as fh:
        fh.write(recipe)

    tileset_id = f"{user}.{tileset_name}"
    commands: list[str] = []
    for s in sources:
        for f in s["files"]:
            # uploadSource (run_mapboxing.bash:12-18)
            commands.append(_curl([
                "curl -X POST",
                f'"{API}/sources/{user}/{s["name"]}?access_token=$MAPBOX_TOKEN"',
                f"-F file=@{f}",
                '--header "Content-Type: multipart/form-data"',
            ]))
        # checkSource (:20-23)
        commands.append(_curl([
            "curl", f'"{API}/sources/{user}/{s["name"]}?access_token=$MAPBOX_TOKEN"',
        ]))
    # validateRecipe (:43-47)
    commands.append(_curl([
        "curl -X PUT", f'"{API}/validateRecipe?access_token=$MAPBOX_TOKEN"',
        f"-d @{recipe_path}", '--header "Content-Type:application/json"',
    ]))
    # createTileset (:57-63)
    commands.append(_curl([
        "curl -X POST", f'"{API}/{tileset_id}?access_token=$MAPBOX_TOKEN"',
        f"-d @{recipe_path}", '--header "Content-Type:application/json"',
    ]))
    # publishTileset (:65-68)
    commands.append(_curl([
        "curl -X POST", f'"{API}/{tileset_id}/publish?access_token=$MAPBOX_TOKEN"',
    ]))

    plan_path = os.path.join(out_dir, "upload_plan.sh")
    with open(plan_path, "w", encoding="utf-8") as fh:
        fh.write("#!/bin/sh\n# generated upload plan — review, export MAPBOX_TOKEN, then run\nset -e\n")
        fh.write("\n".join(commands) + "\n")

    return {
        "sources": sources,
        "recipe_path": recipe_path,
        "plan_path": plan_path,
        "tileset_id": tileset_id,
        "n_commands": len(commands),
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("out_dir")
    p.add_argument("--user", default="example-user")
    p.add_argument("--tileset-name", default="ates")
    p.add_argument("--area-id", type=int, default=None,
                   help="restrict export to one area (default: batch mode, F3)")
    args = p.parse_args(argv)

    import __spark_entry__ as entrymod
    from database2ogr_spark.plans.area_export import export_ndjson
    from database2ogr_spark.session import get_spark

    spark = get_spark("run-mapboxing")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out_dir, exist_ok=True)
    cat = entrymod._ates_catalog(spark)
    dirs = export_ndjson(cat, args.out_dir, args.area_id)
    plan = build_upload_plan(dirs, args.user, args.tileset_name, args.out_dir)
    print(json.dumps({k: plan[k] for k in ("recipe_path", "plan_path", "tileset_id", "n_commands")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
