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
