"""Managed-table plane for the REST catalog server: the spec's
CreateTable route and snapshot-vocabulary commit envelope, translated
onto spec-shaped ``metadata.json`` documents the endpoint OWNS
structurally (not just a pointer it arbitrates).

This is what lets a FOREIGN Iceberg client talk to the endpoint: the
reference's own REST path exists to serve stock clients
(``CatalogMigrationUtil.java:36-46,70-96`` builds
``org.apache.iceberg.rest.RESTCatalog``), and a stock client creates
tables with POST ``/v1/namespaces/{ns}/tables`` and commits with
``assert-ref-snapshot-id`` / ``add-snapshot`` / ``set-snapshot-ref`` —
not with the pointer-model ``set-current-metadata-location`` the
engine's own client uses. Both vocabularies are served; the store's
atomic pointer swap stays the single arbitration point, so a foreign
commit and an engine commit race through the same CAS.

Everything here is pure document logic (build / check / apply / write);
the HTTP wiring lives in :mod:`.rest_server`. Shapes follow the public
Iceberg table-spec and REST-spec JSON forms.
"""

from __future__ import annotations

import copy
import json
import os
import re
import time
import uuid

from .base import CatalogError

__all__ = [
    "CommitConflictError",
    "apply_commit",
    "build_create_doc",
    "is_pointer_commit",
    "write_metadata_doc",
]


class CommitConflictError(CatalogError):
    """A commit requirement failed against the current table state —
    maps to the spec's 409 ``CommitFailedException`` (a retryable
    conflict), unlike :class:`CatalogError`'s 400 (a bad request)."""


# --------------------------------------------------------------- schema
def _max_field_id(node) -> int:
    """Largest field id anywhere in an Iceberg JSON schema node —
    struct fields carry ``id``, lists ``element-id``, maps
    ``key-id``/``value-id``; nested types recurse."""
    best = 0
    if isinstance(node, dict):
        for key in ("id", "element-id", "key-id", "value-id"):
            v = node.get(key)
            if isinstance(v, int):
                best = max(best, v)
        for key in ("fields", "element", "key", "value", "type"):
            v = node.get(key)
            if isinstance(v, (dict, list)):
                best = max(best, _max_field_id(v))
    elif isinstance(node, list):
        for item in node:
            best = max(best, _max_field_id(item))
    return best


def _normalize_spec(spec: dict | None, next_field_id: int = 1000) -> dict:
    """A PartitionSpec JSON with spec-id and per-field field-ids filled
    (CreateTableRequest may omit both; partition field ids start at
    1000 per the spec)."""
    if not spec or not spec.get("fields"):
        return {"spec-id": 0, "fields": []}
    fields = []
    fid = next_field_id
    for f in spec["fields"]:
        if not isinstance(f.get("source-id"), int) or not f.get("transform"):
            raise CatalogError(
                f"partition field needs source-id and transform: {f!r}"
            )
        g = dict(f)
        if not isinstance(g.get("field-id"), int):
            g["field-id"] = fid
            fid += 1
        g.setdefault("name", f"p{g['field-id']}")
        fields.append(g)
    return {"spec-id": int(spec.get("spec-id") or 0), "fields": fields}


def _normalize_order(order: dict | None) -> dict:
    if not order or not order.get("fields"):
        return {"order-id": 0, "fields": []}
    return {
        "order-id": int(order.get("order-id") or 1),
        "fields": list(order["fields"]),
    }


def build_create_doc(
    body: dict, namespace: tuple[str, ...], warehouse: str | None
) -> tuple[str, dict]:
    """(table location, fresh spec-shaped metadata doc) for the spec's
    CreateTableRequest. The schema arrives in Iceberg JSON form and is
    stored verbatim (schema-id forced to 0 — it is the first schema)."""
    name = body.get("name")
    schema = body.get("schema")
    if not name or not isinstance(schema, dict) or schema.get("type") != "struct":
        raise CatalogError(
            "CreateTable requires 'name' and a struct 'schema'"
        )
    location = body.get("location")
    if not location:
        if not warehouse:
            raise CatalogError(
                "CreateTable without an explicit 'location' needs a "
                "server-side warehouse root (none configured)"
            )
        location = os.path.join(warehouse, *namespace, name)
    schema = {**schema, "schema-id": 0}
    spec = _normalize_spec(body.get("partition-spec"))
    order = _normalize_order(body.get("write-order"))
    now_ms = int(time.time() * 1000)
    doc = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": location,
        "last-sequence-number": 0,
        "last-updated-ms": now_ms,
        "last-column-id": _max_field_id(schema),
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": spec["spec-id"],
        "partition-specs": [spec],
        "last-partition-id": max(
            (f["field-id"] for f in spec["fields"]), default=999
        ),
        "default-sort-order-id": order["order-id"],
        "sort-orders": (
            [{"order-id": 0, "fields": []}] if order["order-id"] != 0 else []
        )
        + [order],
        "properties": dict(body.get("properties") or {}),
        "current-snapshot-id": -1,
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
        "refs": {},
    }
    return location, doc


def build_stage_skeleton(
    namespace: tuple[str, ...], name: str, warehouse: str | None,
    location: str | None = None,
) -> dict:
    """Empty-base metadata doc for a staged-create (CTAS/RTAS) commit.

    The endpoint stages STATELESSLY — the stage-create response is not
    durable server state (racing creates arbitrate at the commit's
    pointer CAS, and a shared SQL store may back several endpoints) —
    so the ``assert-create`` commit must carry the stock client's full
    metadata-building vocabulary (``createChanges``: assign-uuid /
    add-schema / set-current-schema / add-spec / set-default-spec /
    add-sort-order / set-default-sort-order / set-location /
    set-properties, then the CTAS data's add-snapshot +
    set-snapshot-ref), applied over this skeleton."""
    if not location:
        if not warehouse:
            raise CatalogError(
                "staged-create commit without a 'set-location' update "
                "needs a server-side warehouse root (none configured)"
            )
        location = os.path.join(warehouse, *namespace, name)
    return {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": location,
        "last-sequence-number": 0,
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": 0,
        "current-schema-id": -1,
        "schemas": [],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": -1,
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
        "refs": {},
    }


# --------------------------------------------------------------- commit
def is_pointer_commit(body: dict) -> bool:
    """True when the envelope speaks the engine's pointer-table model
    (``assert/set-current-metadata-location``) rather than the spec's
    snapshot vocabulary."""
    reqs = body.get("requirements") or []
    updates = body.get("updates") or []
    return any(
        r.get("type") == "assert-current-metadata-location" for r in reqs
    ) or any(
        u.get("action") == "set-current-metadata-location" for u in updates
    )


def _drop_stats_entries(doc: dict, key: str, sid) -> None:
    """Drop the ``key`` list's entries for snapshot ``sid`` in place —
    the one spelling of replace-on-rewrite shared by all four
    statistics actions and the remove-snapshots purge."""
    doc[key] = [
        e for e in doc.get(key, []) if e.get("snapshot-id") != sid
    ]


def _check_requirements(
    doc: dict, requirements: list, staged: bool = False
) -> None:
    for r in requirements:
        t = r.get("type")
        if t == "assert-table-uuid":
            if doc.get("table-uuid") != r.get("uuid"):
                raise CommitConflictError(
                    f"Requirement failed: table uuid is "
                    f"{doc.get('table-uuid')}, expected {r.get('uuid')}"
                )
        elif t == "assert-ref-snapshot-id":
            ref = r.get("ref")
            want = r.get("snapshot-id")  # null = ref must not exist yet
            cur = ((doc.get("refs") or {}).get(ref) or {}).get("snapshot-id")
            if cur != want:
                raise CommitConflictError(
                    f"Requirement failed: branch {ref} was created "
                    "concurrently or has changed: expected snapshot id "
                    f"{want}, found {cur}"
                )
        elif t == "assert-create":
            if staged:
                # staged-create path: the route established the table's
                # absence and the pointer CAS at register decides races
                continue
            # the table exists (we loaded its doc) — a staged create
            # lost by definition
            raise CommitConflictError(
                "Requirement failed: table already exists"
            )
        elif t in (
            "assert-last-assigned-field-id",
            "assert-current-schema-id",
            "assert-last-assigned-partition-id",
            "assert-default-spec-id",
            "assert-default-sort-order-id",
        ):
            key = {
                "assert-last-assigned-field-id": (
                    "last-column-id",
                    "last-assigned-field-id",
                ),
                "assert-current-schema-id": (
                    "current-schema-id",
                    "current-schema-id",
                ),
                "assert-last-assigned-partition-id": (
                    "last-partition-id",
                    "last-assigned-partition-id",
                ),
                "assert-default-spec-id": (
                    "default-spec-id",
                    "default-spec-id",
                ),
                "assert-default-sort-order-id": (
                    "default-sort-order-id",
                    "default-sort-order-id",
                ),
            }[t]
            if doc.get(key[0]) != r.get(key[1]):
                raise CommitConflictError(
                    f"Requirement failed: {key[0]} is {doc.get(key[0])}, "
                    f"expected {r.get(key[1])}"
                )
        else:
            # an unknown requirement silently treated as satisfied
            # would let a conflicting commit through — refuse loudly
            raise CatalogError(f"unsupported commit requirement: {t!r}")


def apply_commit(doc: dict, body: dict, staged: bool = False) -> dict:
    """Check the spec requirements against ``doc`` and apply the spec
    updates; returns the NEW doc (input untouched). Raises
    :class:`CommitConflictError` (→ 409) on requirement failure and
    :class:`CatalogError` (→ 400) on unsupported/invalid shapes —
    unknown actions refuse loudly rather than dropping updates.
    ``staged`` marks a staged-create commit over an empty skeleton
    (``assert-create`` is then satisfied by construction)."""
    if "schemas" not in doc:
        raise CatalogError(
            "table carries a pointer-model metadata doc; snapshot-"
            "vocabulary commits require a spec-shaped table (created "
            "via the CreateTable route)"
        )
    _check_requirements(doc, body.get("requirements") or [], staged=staged)
    new = copy.deepcopy(doc)
    last_added = {"schema": None, "spec": None, "order": None}
    for u in body.get("updates") or []:
        a = u.get("action")
        if a == "assign-uuid":
            new["table-uuid"] = u["uuid"]
        elif a == "upgrade-format-version":
            fv = int(u["format-version"])
            if fv < new.get("format-version", 2):
                raise CatalogError(
                    f"cannot downgrade format-version to {fv}"
                )
            new["format-version"] = fv
        elif a == "add-schema":
            s = dict(u["schema"])
            taken = {sc.get("schema-id") for sc in new.get("schemas", [])}
            sid = s.get("schema-id")
            if not isinstance(sid, int) or sid in taken:
                sid = max((x for x in taken if isinstance(x, int)), default=-1) + 1
                s["schema-id"] = sid
            new.setdefault("schemas", []).append(s)
            new["last-column-id"] = max(
                new.get("last-column-id", 0),
                int(u.get("last-column-id") or 0),
                _max_field_id(s),
            )
            last_added["schema"] = sid
        elif a == "set-current-schema":
            sid = int(u["schema-id"])
            if sid == -1:
                if last_added["schema"] is None:
                    raise CatalogError(
                        "set-current-schema -1 without a preceding "
                        "add-schema in this commit"
                    )
                sid = last_added["schema"]
            if sid not in {
                sc.get("schema-id") for sc in new.get("schemas", [])
            }:
                raise CatalogError(f"no schema with id {sid}")
            new["current-schema-id"] = sid
        elif a == "add-spec":
            sp = _normalize_spec(
                u["spec"], next_field_id=new.get("last-partition-id", 999) + 1
            )
            taken = {
                p.get("spec-id") for p in new.get("partition-specs", [])
            }
            if sp["spec-id"] in taken:
                sp["spec-id"] = max(taken, default=-1) + 1
            new.setdefault("partition-specs", []).append(sp)
            new["last-partition-id"] = max(
                new.get("last-partition-id", 999),
                max((f["field-id"] for f in sp["fields"]), default=999),
            )
            last_added["spec"] = sp["spec-id"]
        elif a == "set-default-spec":
            sid = int(u["spec-id"])
            if sid == -1:
                if last_added["spec"] is None:
                    raise CatalogError(
                        "set-default-spec -1 without a preceding add-spec"
                    )
                sid = last_added["spec"]
            if sid not in {
                p.get("spec-id") for p in new.get("partition-specs", [])
            }:
                raise CatalogError(f"no partition spec with id {sid}")
            new["default-spec-id"] = sid
        elif a == "add-sort-order":
            so = dict(u["sort-order"])
            taken = {o.get("order-id") for o in new.get("sort-orders", [])}
            if so.get("order-id") in taken:
                so["order-id"] = max(taken, default=0) + 1
            new.setdefault("sort-orders", []).append(so)
            last_added["order"] = so["order-id"]
        elif a == "set-default-sort-order":
            oid = int(u["sort-order-id"])
            if oid == -1:
                if last_added["order"] is None:
                    raise CatalogError(
                        "set-default-sort-order -1 without a preceding "
                        "add-sort-order"
                    )
                oid = last_added["order"]
            if oid not in {
                o.get("order-id") for o in new.get("sort-orders", [])
            }:
                raise CatalogError(f"no sort order with id {oid}")
            new["default-sort-order-id"] = oid
        elif a == "add-snapshot":
            snap = dict(u["snapshot"])
            for req_key in ("snapshot-id", "timestamp-ms", "manifest-list"):
                if req_key not in snap:
                    raise CatalogError(
                        f"add-snapshot is missing {req_key!r}"
                    )
            if snap["snapshot-id"] in {
                s["snapshot-id"] for s in new.get("snapshots", [])
            }:
                raise CatalogError(
                    f"snapshot {snap['snapshot-id']} already exists"
                )
            new.setdefault("snapshots", []).append(snap)
            new["last-sequence-number"] = max(
                new.get("last-sequence-number", 0),
                int(snap.get("sequence-number", 0)),
            )
        elif a == "set-snapshot-ref":
            name = u.get("ref-name")
            sid = u.get("snapshot-id")
            typ = u.get("type")
            if not name or sid is None or typ not in ("branch", "tag"):
                raise CatalogError(
                    "set-snapshot-ref needs ref-name, snapshot-id and "
                    "type branch|tag"
                )
            by_id = {
                s["snapshot-id"]: s for s in new.get("snapshots", [])
            }
            if sid not in by_id:
                raise CatalogError(
                    f"set-snapshot-ref names unknown snapshot {sid}"
                )
            ref = {"snapshot-id": sid, "type": typ}
            for opt in (
                "min-snapshots-to-keep",
                "max-snapshot-age-ms",
                "max-ref-age-ms",
            ):
                if u.get(opt) is not None:
                    ref[opt] = u[opt]
            new.setdefault("refs", {})[name] = ref
            if name == "main":
                new["current-snapshot-id"] = sid
                new.setdefault("snapshot-log", []).append(
                    {
                        "snapshot-id": sid,
                        "timestamp-ms": by_id[sid]["timestamp-ms"],
                    }
                )
        elif a == "remove-snapshot-ref":
            name = u.get("ref-name")
            (new.get("refs") or {}).pop(name, None)
            if name == "main":
                new["current-snapshot-id"] = -1
        elif a == "remove-snapshots":
            drop = set(u.get("snapshot-ids") or [])
            # refuse to orphan a ref: a metadata doc whose main ref (or
            # any branch/tag) points at a removed snapshot fails every
            # subsequent reader — the stock builder rejects this too
            still_referenced = sorted(
                sid
                for sid in drop
                if sid == new.get("current-snapshot-id")
                or any(
                    r.get("snapshot-id") == sid
                    for r in (new.get("refs") or {}).values()
                )
            )
            if still_referenced:
                raise CatalogError(
                    "remove-snapshots would orphan referenced snapshot(s) "
                    + ", ".join(str(s) for s in still_referenced)
                )
            new["snapshots"] = [
                s
                for s in new.get("snapshots", [])
                if s["snapshot-id"] not in drop
            ]
            new["snapshot-log"] = [
                e
                for e in new.get("snapshot-log", [])
                if e["snapshot-id"] not in drop
            ]
            # statistics files of expired snapshots go with them (the
            # stock builder does the same) — else stale entries
            # accumulate unboundedly across expire cycles
            for sid in drop:
                _drop_stats_entries(new, "statistics", sid)
                _drop_stats_entries(new, "partition-statistics", sid)
        elif a in (
            "set-statistics",
            "remove-statistics",
            "set-partition-statistics",
            "remove-partition-statistics",
        ):
            # the spec's per-snapshot statistics-file registration:
            # replace-on-rewrite lists (what a stock client commits
            # after writing a puffin)
            key = (
                "partition-statistics"
                if "partition" in a
                else "statistics"
            )
            entry = None
            if a.startswith("set-"):
                entry = u.get(key) or {}
                sid = entry.get("snapshot-id", u.get("snapshot-id"))
                # a bare entry would persist and then fail every stock
                # reader's required-field parse, bricking the table —
                # reject at commit time like add-snapshot does
                for req_key in ("statistics-path", "file-size-in-bytes"):
                    if req_key not in entry:
                        raise CatalogError(f"{a} is missing {req_key!r}")
            else:
                sid = u.get("snapshot-id")
            if sid is None:
                raise CatalogError(f"{a} needs snapshot-id")
            _drop_stats_entries(new, key, sid)
            if entry is not None:
                new[key].append({**entry, "snapshot-id": sid})
        elif a == "set-properties":
            new.setdefault("properties", {}).update(u.get("updates") or {})
        elif a == "remove-properties":
            for k in u.get("removals") or []:
                new.get("properties", {}).pop(k, None)
        elif a == "set-location":
            new["location"] = u["location"]
        else:
            raise CatalogError(f"unsupported commit update action: {a!r}")
    new["last-updated-ms"] = int(time.time() * 1000)
    return new


# ---------------------------------------------------------------- files
_ORDINAL_RE = re.compile(r"^(\d+)-.*\.metadata\.json$|^v(\d+)\.metadata\.json$")


def _ordinal(metadata_location: str | None) -> int:
    if not metadata_location:
        return -1
    m = _ORDINAL_RE.match(os.path.basename(metadata_location))
    if m is None:
        return -1
    return int(m.group(1) or m.group(2))


def write_metadata_doc(
    doc: dict,
    prior_location: str | None = None,
    prior_updated_ms: int | None = None,
) -> tuple[str, dict]:
    """Write ``doc`` as the next ``<NNNNN>-<uuid>.metadata.json`` under
    ``{location}/metadata`` (the OSS naming the engine's reader already
    orders). On a commit, the prior doc is appended to metadata-log
    with ITS OWN last-updated-ms — the spec's rollback chain. The uuid
    suffix makes racing writers' candidate files collision-free; the
    store's pointer CAS decides which one becomes current. Returns
    ``(path, doc-as-written)`` so callers respond without re-reading
    the file they just serialized."""
    if prior_location:
        doc = {
            **doc,
            "metadata-log": (doc.get("metadata-log") or [])
            + [
                {
                    "timestamp-ms": prior_updated_ms
                    if prior_updated_ms is not None
                    else doc.get("last-updated-ms"),
                    "metadata-file": prior_location,
                }
            ],
        }
    meta_dir = os.path.join(doc["location"], "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    nxt = _ordinal(prior_location) + 1
    path = os.path.join(
        meta_dir, f"{nxt:05d}-{uuid.uuid4()}.metadata.json"
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=2)
    os.replace(tmp, path)
    return path, doc
