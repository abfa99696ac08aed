"""Static STAC catalog source — the analog of the reference's cloud
collection discovery (``R/sits_cube.R`` + the ``R/sources/``
``sits_source_*`` provider layer, ~4000 LoC of per-provider STAC
configs; here ONE implementation of the open STAC 1.0.0 JSON spec,
static-catalog flavor, serves every "provider").

A published dataset is a directory tree of JSON documents::

    root/catalog.json                      links -> collections
    root/<coll>/collection.json            temporal extent, links -> items
    root/<coll>/items/<id>.json            Feature: datetime range + assets

Items carry ``start_datetime``/``end_datetime`` (from Parquet footers —
no data pass) and one ``data`` asset whose href points at the Parquet
file. Discovery (:func:`stac_search`) walks links and filters by
collection id and time-range overlap exactly like a STAC API
``/search``; :func:`read_stac` turns matching items into a pruned
``ray.data.read_parquet`` (only intersecting assets are opened — the
``sources.read_cube`` discipline, applied to the catalog layer).

No network in this container, so hrefs are file paths; the JSON layout
is spec-shaped (type/stac_version/links/assets), making the walker the
honest counterpart of the reference's provider adapters.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_STAC_VERSION = "1.0.0"


def _iso(ts) -> str | None:
    if ts is None:
        return None
    return str(np.datetime64(ts, "us")) + "Z"


def _parse_iso(s):
    if s is None:
        return None
    return np.datetime64(s.rstrip("Z"), "us")


def publish_stac(root: str, collections: dict[str, str | list[str]],
                 ts_col: str = "ts") -> str:
    """Publish Parquet filesets as a static STAC catalog at ``root``.

    ``collections``: ``{collection_id: directory-or-file-or-glob}``. One
    item per Parquet file; its temporal extent comes from footer
    statistics (``sources.open_catalog`` — KBs of IO per file, parallel).
    Returns the catalog.json path.
    """
    from sits_ray.sources import open_catalog

    os.makedirs(root, exist_ok=True)
    coll_links = []
    for cid, src in collections.items():
        paths: list[str] = []
        for pat in ([src] if isinstance(src, str) else list(src)):
            if os.path.isdir(pat):
                paths += sorted(glob.glob(os.path.join(pat, "*.parquet")))
            else:
                paths += sorted(glob.glob(pat)) or [pat]
        cdir = os.path.join(root, cid)
        os.makedirs(os.path.join(cdir, "items"), exist_ok=True)
        item_links = []
        ext_lo = ext_hi = None
        for p in paths:
            cat = open_catalog(p, ts_col=ts_col)
            lo = cat["ts_min"][0].as_py()
            hi = cat["ts_max"][0].as_py()
            ext_lo = lo if ext_lo is None else min(ext_lo, lo)
            ext_hi = hi if ext_hi is None else max(ext_hi, hi)
            iid = os.path.splitext(os.path.basename(p))[0]
            item = {
                "type": "Feature",
                "stac_version": _STAC_VERSION,
                "id": iid,
                "collection": cid,
                "geometry": None,
                "properties": {
                    "datetime": None,
                    "start_datetime": _iso(lo),
                    "end_datetime": _iso(hi),
                    "table:row_count": int(cat["n_rows"][0].as_py()),
                },
                "assets": {
                    "data": {
                        "href": os.path.abspath(p),
                        "type": "application/x-parquet",
                    }
                },
                "links": [],
            }
            ipath = os.path.join(cdir, "items", f"{iid}.json")
            with open(ipath, "w") as fh:
                json.dump(item, fh)
            item_links.append(
                {"rel": "item", "href": os.path.join("items", f"{iid}.json")}
            )
        coll = {
            "type": "Collection",
            "stac_version": _STAC_VERSION,
            "id": cid,
            "description": f"parquet fileset {cid}",
            "license": "proprietary",
            "extent": {
                "spatial": {"bbox": [[-180, -90, 180, 90]]},
                "temporal": {"interval": [[_iso(ext_lo), _iso(ext_hi)]]},
            },
            "links": item_links,
        }
        with open(os.path.join(cdir, "collection.json"), "w") as fh:
            json.dump(coll, fh)
        coll_links.append(
            {"rel": "child", "href": os.path.join(cid, "collection.json")}
        )
    catalog = {
        "type": "Catalog",
        "stac_version": _STAC_VERSION,
        "id": os.path.basename(os.path.normpath(root)) or "catalog",
        "description": "sits_ray static catalog",
        "links": coll_links,
    }
    cpath = os.path.join(root, "catalog.json")
    with open(cpath, "w") as fh:
        json.dump(catalog, fh)
    return cpath


def stac_search(catalog_path: str, collections=None, datetime=None,
                limit: int | None = None) -> list[dict]:
    """Walk a static catalog like a STAC ``/search``: filter items by
    collection id and [t0, t1) overlap (either bound None). Returns item
    dicts sorted by (collection, id)."""
    root = os.path.dirname(os.path.abspath(catalog_path))
    with open(catalog_path) as fh:
        cat = json.load(fh)
    if cat.get("type") != "Catalog":
        raise ValueError(f"{catalog_path}: not a STAC Catalog document")
    lo = _parse_iso(datetime[0]) if datetime and datetime[0] is not None else None
    hi = _parse_iso(datetime[1]) if datetime and datetime[1] is not None else None
    out = []
    for link in cat.get("links", []):
        if link.get("rel") != "child":
            continue
        cpath = os.path.join(root, link["href"])
        with open(cpath) as fh:
            coll = json.load(fh)
        if collections is not None and coll["id"] not in collections:
            continue
        cdir = os.path.dirname(cpath)
        for il in coll.get("links", []):
            if il.get("rel") != "item":
                continue
            with open(os.path.join(cdir, il["href"])) as fh:
                item = json.load(fh)
            a = _parse_iso(item["properties"].get("start_datetime"))
            b = _parse_iso(item["properties"].get("end_datetime"))
            if hi is not None and a is not None and a >= hi:
                continue
            if lo is not None and b is not None and b < lo:
                continue
            out.append(item)
    out.sort(key=lambda it: (it.get("collection", ""), it["id"]))
    return out[:limit] if limit is not None else out


def read_stac(items: list[dict], columns: list[str] | None = None,
              datetime=None, ts_col: str = "ts"):
    """Items -> pruned Dataset read (only the matched assets open; the
    residual time predicate applies per batch, asset="data")."""
    import ray.data as rd

    files = [it["assets"]["data"]["href"] for it in items]
    if not files:
        return rd.from_arrow(pa.table({}))
    ds = rd.read_parquet(files, columns=columns)
    if not datetime:
        return ds
    lo = _parse_iso(datetime[0]) if datetime[0] is not None else None
    hi = _parse_iso(datetime[1]) if datetime[1] is not None else None

    import pyarrow.compute as pc

    def residual(t: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(t[ts_col], pa.scalar(lo)))
        if hi is not None:
            mask = pc.and_(mask, pc.less(t[ts_col], pa.scalar(hi)))
        return t.filter(mask)

    return ds.map_batches(residual, batch_format="pyarrow")


def list_collections(catalog_path: str) -> list[dict]:
    """Collection inventory of a static catalog (``sits_list_collections``,
    ``R/sits_cube.R``: the reference prints each provider's collections;
    here each child collection's id, description and temporal extent)."""
    root = os.path.dirname(os.path.abspath(catalog_path))
    with open(catalog_path) as fh:
        cat = json.load(fh)
    if cat.get("type") != "Catalog":
        raise ValueError(f"{catalog_path}: not a STAC Catalog document")
    out = []
    for link in cat.get("links", []):
        if link.get("rel") != "child":
            continue
        with open(os.path.join(root, link["href"])) as fh:
            coll = json.load(fh)
        out.append(
            {
                "id": coll["id"],
                "description": coll.get("description", ""),
                "interval": coll.get("extent", {})
                .get("temporal", {})
                .get("interval", [[None, None]])[0],
                "n_items": sum(
                    1 for l in coll.get("links", []) if l.get("rel") == "item"
                ),
            }
        )
    return sorted(out, key=lambda c: c["id"])
