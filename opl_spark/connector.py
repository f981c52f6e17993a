"""Data Studio connector request synthesis, re-expressed server-side.

The reference's community connector turns a Data Studio ``getData``
request — a fact name, a date range, and a list of requested field ids
— into an ``/aggregate`` call (reference:
DataStudio-connector/Codice.gs:283-349):

- the requested-field universe comes from the fact's dimension
  metadata: a flat dimension contributes its name, the ``date``
  dimension contributes the single field id ``date``, and a leveled
  dimension contributes each level's *attributes* when it has any,
  else the level name (``extractDimensions``, Codice.gs:68-105);
- drilldown synthesis walks the fact's dimensions in declaration
  order (Codice.gs:303-331): a requested flat dimension drills as
  itself; a requested ``date`` field always drills to ``day``
  (Codice.gs:313-314, 326-327); for a leveled dimension the DEEPEST
  level with a requested attribute (or name, when attribute-less)
  wins, addressed by the matched attribute name
  (``verifyAttributes``, Codice.gs:289-297);
- the Data Studio date range becomes a hierarchy tuple-range cut
  ``date:YYYY,MM,DD-YYYY,MM,DD`` (Codice.gs:336-345);
- the call requests ``output=table`` (Codice.gs:349).

These rules are pure metadata → string functions, so they live in the
engine (testable, reusable by any BI shim) instead of a copy of the
Apps Script client.
"""

from __future__ import annotations

from opl_spark.catalog import Catalog, Dimension


def _is_flat(dim: Dimension) -> bool:
    return (
        len(dim.levels) == 1
        and dim.levels[0].name == dim.name
        and not dim.levels[0].attributes
    )


def connector_field_ids(catalog: Catalog, fact: str) -> list[str]:
    """The field-id universe the connector exposes for a fact
    (``extractDimensions``, Codice.gs:68-105): flat dimension → its
    name; ``date`` → the single id ``date``; leveled dimension → each
    level's attributes when present, else the level name."""
    out: list[str] = []
    for dim in catalog.fact(fact).dimensions:
        if _is_flat(dim):
            out.append(dim.name)
        elif dim.name == "date":
            out.append("date")
        else:
            for lv in dim.levels:
                if lv.attributes:
                    out.extend(lv.attributes)
                else:
                    out.append(lv.name)
    return out


def synthesize_drilldown(catalog: Catalog, fact: str, fields: list[str]) -> str:
    """Requested fields → drilldown string (Codice.gs:303-331)."""
    requested = set(fields)
    parts: list[str] = []
    for dim in catalog.fact(fact).dimensions:
        if _is_flat(dim):
            if dim.name in requested:
                parts.append(dim.name)  # parent_node = null form
        elif dim.name == "date":
            if "date" in requested:
                parts.append("date:day")  # date ALWAYS drills to day
        else:
            chosen: str | None = None
            for lv in dim.levels:  # deepest matching level wins
                if lv.attributes:
                    for attr in lv.attributes:
                        if attr in requested:
                            chosen = attr  # addressed by the attribute
                            break
                elif lv.name in requested:
                    chosen = lv.name
            if chosen is not None:
                parts.append(f"{dim.name}:{chosen}")
    return "|".join(parts)


def synthesize_cut(start_date: str, end_date: str) -> str:
    """ISO date range → hierarchy tuple-range cut (Codice.gs:336-345):
    ``date:YYYY,MM,DD-YYYY,MM,DD``."""
    return f"date:{start_date.replace('-', ',')}-{end_date.replace('-', ',')}"


def synthesize_request(
    catalog: Catalog,
    fact: str,
    fields: list[str],
    start_date: str,
    end_date: str,
) -> tuple[str, dict[str, str]]:
    """Full getData → (path, params) synthesis: the aggregate URL the
    connector would fetch (Codice.gs:334-349), as transport-free parts
    for ``OlapApi.handle``."""
    params: dict[str, str] = {"cut": synthesize_cut(start_date, end_date)}
    drilldown = synthesize_drilldown(catalog, fact, fields)
    if drilldown:
        params["drilldown"] = drilldown
    params["output"] = "table"
    return f"/olap/{fact}/aggregate", params
