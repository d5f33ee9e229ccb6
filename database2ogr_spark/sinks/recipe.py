"""K6 — Mapbox tileset recipe JSON generator (reference
``src/make-recipe.js:12-55``; orchestration ``run_mapboxing.bash:25-76``).

Pure driver-side metadata: layer name per exported table file (stem of the
filename, X16), source URI ``mapbox://tileset-source/<user>/<name>``,
zoom bounds, optional ``{recipe, name}`` wrapper (the reference's ``WRAP=1``).
The reference crashes on missing argv and has a TDZ bug (bug ledger) — this
implementation validates instead.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F


def layer_source(user: str, name_col: Column | str) -> Column:
    """X13 — the per-layer tileset-source URI as a Column
    (``mapbox://tileset-source/<user>/<name>``, reference
    ``src/make-recipe.js:12-18``)."""
    name = F.col(name_col) if isinstance(name_col, str) else name_col
    return F.concat(F.lit(f"mapbox://tileset-source/{user}/"), name)


def layer_json(user: str, name_col: Column | str, *, minzoom: int = 0, maxzoom: int = 22) -> Column:
    """One recipe layer as a JSON string Column (distributed variant of
    :func:`make_recipe` for catalogs with many layers)."""
    name = F.col(name_col) if isinstance(name_col, str) else name_col
    return F.to_json(
        F.struct(
            name.alias("name"),
            layer_source(user, name).alias("source"),
            F.lit(minzoom).alias("minzoom"),
            F.lit(maxzoom).alias("maxzoom"),
        )
    )


def make_recipe(
    files: list[str],
    user: str,
    *,
    minzoom: int = 0,
    maxzoom: int = 22,
    wrap_name: str | None = None,
) -> str:
    """Build the recipe JSON string for the given exported layer files."""
    names = [f.split("/")[-1].split(".")[0] for f in files if f and f.strip()]
    if not names:
        raise ValueError("make_recipe requires at least one non-blank file name")
    layers = {
        name: {
            "source": f"mapbox://tileset-source/{user}/{name}",
            "minzoom": minzoom,
            "maxzoom": maxzoom,
        }
        for name in names
    }
    recipe = {"version": 1, "layers": layers}
    if wrap_name is not None:
        return json.dumps({"recipe": recipe, "name": wrap_name})
    return json.dumps(recipe)
