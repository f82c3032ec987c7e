"""Per-type service-catalog classes with distinct construction contracts.

The reference dispatches each ``CatalogType`` to a distinct Iceberg
implementation class (``api/.../CatalogMigrationUtil.java:70-96``), and
each implementation validates its own required properties at
``initialize()`` time. The *execution* plane here is the local
:class:`~.sql.SqlCatalog` store (no cloud service exists in this
container), but the construction contract — which properties are
required, the error text when they are missing, and the namespace
semantics — is type-specific, mirroring the public Apache Iceberg
implementations:

- ``JdbcCatalog``: requires ``uri`` ("JDBC connection URI is required");
- ``NessieCatalog``: requires ``uri``; ``ref`` defaults to ``main``;
- ``RestCatalog``: requires ``uri`` (the REST endpoint);
- ``GlueCatalog`` / ``DynamoDbCatalog`` / ``EcsCatalog``: require a
  non-blank ``warehouse`` path ("Cannot initialize <X> because
  warehousePath must not be null or empty");
- Glue databases are flat, so ``GlueCatalog`` rejects nested and empty
  namespaces (same restriction shape the reference pins for Hive in
  ``ITHadoopToHiveCatalogMigrator.java:49-66``).

In the simulation the store path is derived from ``uri`` (JDBC-like
types) or ``warehouse`` (path-rooted types); on a real deployment each
class is replaced by the Iceberg impl the reference names, with the
same properties passed through.
"""

from __future__ import annotations

import json
import os

from .base import (
    PURGE_REFUSAL_MESSAGE,
    Catalog,
    CatalogError,
    Namespace,
    NamespaceAlreadyExistsError,
    NamespaceNotEmptyError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
    UnprocessableError,
)
from .identifiers import TableIdentifier
from .sql import SqlCatalog


def _require(properties: dict[str, str], key: str, message: str) -> str:
    value = properties.get(key)
    if value is None or not str(value).strip():
        raise ValueError(message)
    return value


class JdbcCatalog(SqlCatalog):
    """JDBC-backed catalog (reference impl: ``org.apache.iceberg.jdbc.JdbcCatalog``)."""

    catalog_type = "JDBC"

    def __init__(self, name: str, properties: dict[str, str]):
        uri = _require(properties, "uri", "JDBC connection URI is required")
        super().__init__(name=name, uri=uri)


class NessieCatalog(SqlCatalog):
    """Nessie-backed catalog (reference impl:
    ``org.apache.iceberg.nessie.NessieCatalog``). ``ref`` names the
    Nessie branch and defaults to ``main``, as in the public impl
    (`/root/reference/README.md:72` passes ``ref=main`` in the catalog
    properties).

    Refs are REAL here, not recorded-and-ignored: each branch is an
    independent catalog state over the shared store (namespace and table
    pointers scoped per ref), so registering on ``ref=dev`` is invisible
    to ``ref=main``, and the migration plane pointed at two refs of the
    SAME uri promotes tables between branches — the Nessie
    merge-by-migration workflow. Catalogs on an unknown ref fail at
    construction, like a Nessie client against a missing branch."""

    catalog_type = "NESSIE"
    DEFAULT_REF = "main"

    def __init__(self, name: str, properties: dict[str, str]):
        uri = _require(properties, "uri", "Nessie URI cannot be null")
        self.ref = properties.get("ref") or self.DEFAULT_REF
        super().__init__(name=name, uri=uri, scope=self.ref)
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS nessie_refs ("
            " ref TEXT PRIMARY KEY, kind TEXT NOT NULL DEFAULT 'branch')"
        )
        cols = {r[1] for r in self._conn.execute("PRAGMA table_info(nessie_refs)")}
        if "kind" not in cols:  # pre-tags stores: everything was a branch
            self._conn.execute(
                "ALTER TABLE nessie_refs ADD COLUMN kind TEXT NOT NULL DEFAULT 'branch'"
            )
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS nessie_base ("
            " ref TEXT NOT NULL, ns TEXT NOT NULL, name TEXT NOT NULL,"
            " metadata_location TEXT NOT NULL, PRIMARY KEY (ref, ns, name))"
        )
        self._conn.execute(
            "INSERT OR IGNORE INTO nessie_refs (ref) VALUES (?)", (self.DEFAULT_REF,)
        )
        # a pre-refs Nessie store has all rows at scope '' (the flat
        # single-catalog layout) while this catalog queries per-ref
        # scopes — previously registered tables would be invisible.
        # Adopt the legacy rows as main's state by COPY, not move (a
        # plain JdbcCatalog sharing the uri keeps seeing its unscoped
        # rows — adoption must never hijack another catalog's state),
        # exactly once (a marker row prevents re-adoption from
        # resurrecting tables later dropped on main), and only when no
        # scoped rows exist (a refs-aware store with stray '' rows is
        # ambiguous and left alone).
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS nessie_meta ("
            " key TEXT PRIMARY KEY, value TEXT NOT NULL)"
        )
        adopted = self._conn.execute(
            "SELECT 1 FROM nessie_meta WHERE key = 'legacy_adopted'"
        ).fetchone()
        if not adopted:
            has_scoped = (
                self._conn.execute(
                    "SELECT 1 FROM tables WHERE scope != '' LIMIT 1"
                ).fetchone()
                or self._conn.execute(
                    "SELECT 1 FROM namespaces WHERE scope != '' LIMIT 1"
                ).fetchone()
            )
            if not has_scoped:
                self._conn.execute(
                    "INSERT OR IGNORE INTO tables (scope, ns, name, metadata_location)"
                    " SELECT ?, ns, name, metadata_location FROM tables"
                    " WHERE scope = ''",
                    (self.DEFAULT_REF,),
                )
                self._conn.execute(
                    "INSERT OR IGNORE INTO namespaces (scope, ns, properties)"
                    " SELECT ?, ns, properties FROM namespaces WHERE scope = ''",
                    (self.DEFAULT_REF,),
                )
            # OR IGNORE: two instances initializing concurrently both
            # see 'not adopted'; the adoption copies above are already
            # idempotent, so the loser's marker insert must be a no-op,
            # not an IntegrityError
            self._conn.execute(
                "INSERT OR IGNORE INTO nessie_meta (key, value)"
                " VALUES ('legacy_adopted', '1')"
            )
        self._conn.commit()
        if not self._ref_exists(self.ref):
            self.close()
            raise CatalogError(
                f"Nessie ref {self.ref!r} does not exist in {uri}; "
                "create_branch from an existing ref first"
            )

    def _ref_exists(self, ref: str) -> bool:
        return (
            self._conn.execute(
                "SELECT 1 FROM nessie_refs WHERE ref = ?", (ref,)
            ).fetchone()
            is not None
        )

    def _ref_kind(self, ref: str) -> str | None:
        row = self._conn.execute(
            "SELECT kind FROM nessie_refs WHERE ref = ?", (ref,)
        ).fetchone()
        return row[0] if row else None

    def _check_writable(self) -> None:
        if self._ref_kind(self.ref) == "tag":
            raise CatalogError(
                f"Nessie ref {self.ref!r} is a tag: tags are immutable "
                "(branch from it to make changes)"
            )

    def create_namespace(self, namespace, properties=None) -> None:
        self._check_writable()
        super().create_namespace(namespace, properties)

    def update_namespace_properties(
        self, namespace, removals=None, updates=None
    ) -> dict:
        # tags are immutable for ALL state, properties included
        self._check_writable()
        return super().update_namespace_properties(
            namespace, removals=removals, updates=updates
        )

    def rename_table(self, src, dst) -> None:
        self._check_writable()
        super().rename_table(src, dst)

    def drop_namespace(self, namespace) -> bool:
        self._check_writable()
        return super().drop_namespace(namespace)

    def register_table(self, identifier, metadata_location: str) -> None:
        self._check_writable()
        super().register_table(identifier, metadata_location)

    def drop_table(self, identifier, purge: bool = False) -> bool:
        self._check_writable()
        return super().drop_table(identifier, purge=purge)

    def swap_table_metadata_location(
        self, identifier, expected_location: str, new_location: str
    ) -> bool:
        self._check_writable()  # tags are immutable: no pointer swaps
        return super().swap_table_metadata_location(
            identifier, expected_location, new_location
        )

    def create_tag(self, name: str, from_ref: str | None = None) -> None:
        """Immutable named state (e.g. the audited nightly snapshot):
        same pointer-row copy as a branch, but every mutation through a
        tag-scoped catalog is rejected."""
        src = from_ref if from_ref is not None else self.ref
        with self._lock:
            if self._ref_exists(name):
                raise CatalogError(f"Nessie ref {name!r} already exists")
            if not self._ref_exists(src):
                raise CatalogError(f"Nessie ref {src!r} does not exist")
            self._conn.execute(
                "INSERT INTO nessie_refs (ref, kind) VALUES (?, 'tag')", (name,)
            )
            self._conn.execute(
                "INSERT INTO namespaces (scope, ns, properties)"
                " SELECT ?, ns, properties FROM namespaces WHERE scope = ?",
                (name, src),
            )
            self._conn.execute(
                "INSERT INTO tables (scope, ns, name, metadata_location)"
                " SELECT ?, ns, name, metadata_location FROM tables WHERE scope = ?",
                (name, src),
            )
            self._conn.commit()

    def list_refs(self) -> list[str]:
        return [
            r[0]
            for r in self._conn.execute("SELECT ref FROM nessie_refs ORDER BY ref")
        ]

    def list_refs_with_kind(self) -> dict[str, str]:
        return dict(
            self._conn.execute("SELECT ref, kind FROM nessie_refs ORDER BY ref")
        )

    def create_branch(self, name: str, from_ref: str | None = None) -> None:
        """New branch carrying ``from_ref``'s current state (default:
        this catalog's ref). Pointer rows are copied — observably the
        zero-copy branch of real Nessie, since a catalog entry IS just
        a metadata-location string; no table data or metadata files are
        duplicated."""
        src = from_ref if from_ref is not None else self.ref
        with self._lock:
            if self._ref_exists(name):
                raise CatalogError(f"Nessie ref {name!r} already exists")
            if not self._ref_exists(src):
                raise CatalogError(f"Nessie ref {src!r} does not exist")
            self._conn.execute("INSERT INTO nessie_refs (ref) VALUES (?)", (name,))
            self._conn.execute(
                "INSERT INTO namespaces (scope, ns, properties)"
                " SELECT ?, ns, properties FROM namespaces WHERE scope = ?",
                (name, src),
            )
            self._conn.execute(
                "INSERT INTO tables (scope, ns, name, metadata_location)"
                " SELECT ?, ns, name, metadata_location FROM tables WHERE scope = ?",
                (name, src),
            )
            # merge base: the branch-point state, so merge_branch can
            # three-way diff (what changed HERE vs what changed THERE)
            self._conn.execute(
                "INSERT INTO nessie_base (ref, ns, name, metadata_location)"
                " SELECT ?, ns, name, metadata_location FROM tables WHERE scope = ?",
                (name, src),
            )
            self._conn.commit()

    def drop_branch(self, name: str) -> None:
        if name == self.DEFAULT_REF:
            raise CatalogError("cannot drop the main branch")
        with self._lock:
            if not self._ref_exists(name):
                raise CatalogError(f"Nessie ref {name!r} does not exist")
            self._conn.execute("DELETE FROM nessie_refs WHERE ref = ?", (name,))
            self._conn.execute("DELETE FROM namespaces WHERE scope = ?", (name,))
            self._conn.execute("DELETE FROM tables WHERE scope = ?", (name,))
            self._conn.execute("DELETE FROM nessie_base WHERE ref = ?", (name,))
            self._conn.commit()

    def with_ref(self, ref: str) -> "NessieCatalog":
        """A catalog view of another branch of the same store."""
        return NessieCatalog(self.name, {"uri": self.uri, "ref": ref})

    def _scope_state(self, scope: str, table: str = "tables") -> dict:
        key_col = "scope" if table == "tables" else "ref"
        return {
            (r[0], r[1]): r[2]
            for r in self._conn.execute(
                f"SELECT ns, name, metadata_location FROM {table} WHERE {key_col} = ?",
                (scope,),
            )
        }

    def merge_branch(self, from_ref: str, into_ref: str | None = None) -> dict:
        """Three-way merge of ``from_ref`` into ``into_ref`` (default
        main) — Nessie's merge endpoint: pointer changes made on the
        branch since its base are applied to the target; a table
        changed on BOTH sides to different locations is a conflict, and
        conflicts abort the whole merge with no partial writes (the
        check pass completes before the first mutation). The branch's
        base then advances to the merged state, so a later merge
        carries only future changes.

        KNOWN LIMIT — namespace properties: the merge tracks TABLE
        POINTER changes three-way (nessie_base records the branch's
        base). Namespace PROPERTY edits made on the branch carry only
        for namespaces the branch INTRODUCED; an existing namespace
        keeps the target's properties (no base is recorded for them,
        so a three-way property merge cannot tell branch edits from
        target edits). Re-apply property changes on the target after
        merging when they matter."""
        into = into_ref if into_ref is not None else self.DEFAULT_REF
        with self._lock:
            for ref in (from_ref, into):
                if not self._ref_exists(ref):
                    raise CatalogError(f"Nessie ref {ref!r} does not exist")
            if self._ref_kind(into) == "tag":
                raise CatalogError(f"cannot merge into tag {into!r}: tags are immutable")
            src = self._scope_state(from_ref)
            dst = self._scope_state(into)
            base = self._scope_state(from_ref, table="nessie_base")

            added, updated, deleted, conflicts = [], [], [], []
            for key, src_loc in src.items():
                base_loc, dst_loc = base.get(key), dst.get(key)
                if src_loc == base_loc or src_loc == dst_loc:
                    continue  # unchanged on branch, or already identical
                if dst_loc is None and base_loc is None:
                    added.append(key)
                elif dst_loc == base_loc:
                    (added if dst_loc is None else updated).append(key)
                else:
                    conflicts.append(key)
            for key, base_loc in base.items():
                if key in src:
                    continue  # still present on branch
                dst_loc = dst.get(key)
                if dst_loc is None:
                    continue  # gone on both sides
                if dst_loc == base_loc:
                    deleted.append(key)
                else:
                    conflicts.append(key)
            if conflicts:
                names = ", ".join(
                    ".".join(filter(None, (k[0].replace("\x1f", "."), k[1])))
                    for k in sorted(conflicts)
                )
                raise CatalogError(
                    f"merge of {from_ref!r} into {into!r} has conflicts "
                    f"(changed on both branches): {names}"
                )

            for ns, name in added + updated:
                self._conn.execute(
                    "INSERT OR REPLACE INTO tables (scope, ns, name, metadata_location)"
                    " VALUES (?, ?, ?, ?)",
                    (into, ns, name, src[(ns, name)]),
                )
            for ns, name in deleted:
                self._conn.execute(
                    "DELETE FROM tables WHERE scope = ? AND ns = ? AND name = ?",
                    (into, ns, name),
                )
            # namespaces the branch introduced come along
            self._conn.execute(
                "INSERT OR IGNORE INTO namespaces (scope, ns, properties)"
                " SELECT ?, ns, properties FROM namespaces WHERE scope = ?",
                (into, from_ref),
            )
            # advance the branch base to the merged target state
            self._conn.execute("DELETE FROM nessie_base WHERE ref = ?", (from_ref,))
            self._conn.execute(
                "INSERT INTO nessie_base (ref, ns, name, metadata_location)"
                " SELECT ?, ns, name, metadata_location FROM tables WHERE scope = ?",
                (from_ref, into),
            )
            self._conn.commit()

        def _names(keys):
            return [
                ".".join(filter(None, (ns.replace("\x1f", "."), name)))
                for ns, name in sorted(keys)
            ]

        return {
            "added": _names(added),
            "updated": _names(updated),
            "deleted": _names(deleted),
        }


class RestCatalog(Catalog):
    """REST-protocol catalog CLIENT (reference impl:
    ``org.apache.iceberg.rest.RESTCatalog``) — WIRE-REAL: every catalog
    operation is an HTTP request against an Iceberg REST-catalog
    endpoint speaking the public OpenAPI routes
    (see :mod:`.rest_server`), not an in-process shortcut.

    Two uri forms:

    - ``http(s)://...`` — connect to an already-running endpoint
      (what the reference's RESTCatalog does);
    - a filesystem path — self-hosted mode: spin up an in-process
      :class:`~.rest_server.IcebergRestCatalogServer` over a
      :class:`~.sql.SqlCatalog` store at that path and connect to it
      over real localhost HTTP. This keeps the CLI/test invocation
      shape (``uri=/path/catalog.db``) while making every call travel
      the actual wire protocol; two clients on the same path each host
      their own endpoint over the shared sqlite store, whose
      database-level locking arbitrates exactly as one shared service
      would.

    Error envelopes (the spec's ``ErrorModel``) map back to the local
    exception classes with the MESSAGE TEXT VERBATIM, so the
    reference-pinned CLI phrasing is unchanged by the wire hop."""

    catalog_type = "REST"
    supports_namespaces = True
    supports_entry_only_delete = True

    def __init__(self, name: str, properties: dict[str, str]):
        uri = _require(properties, "uri", "Invalid uri for http client: null")
        super().__init__(name=name)
        import threading

        self._server = None
        self._closed = False
        self._local = threading.local()
        # every pooled connection ever created, so close() can really
        # release the sockets (thread-locals are invisible cross-thread)
        self._conns: list = []
        self._conns_lock = threading.Lock()
        self._token = properties.get("token")
        # requested list-page size (spec pageSize); None = server-sized
        # single page. The client ALWAYS follows next-page-token, so a
        # paginating server is handled regardless of this setting.
        ps = properties.get("rest.page-size")
        self._page_size = int(ps) if ps else None
        if uri.startswith(("http://", "https://")):
            self.uri = uri.rstrip("/")
        else:
            from .rest_server import IcebergRestCatalogServer

            self._server = IcebergRestCatalogServer(
                SqlCatalog(name=f"{name}-store", uri=uri),
                owns_store=True,
                # spec CreateTable without an explicit location lands
                # under a warehouse next to the store's db file
                warehouse=properties.get("warehouse")
                or os.path.join(
                    os.path.dirname(os.path.abspath(uri)), "rest-warehouse"
                ),
            )
            self.uri = self._server.start()
        # connectivity + config handshake, as the real client performs;
        # the spec serves a route PREFIX via config overrides, which
        # clients prepend to every subsequent route
        status, cfg = self._request("GET", "/v1/config")
        if status != 200:
            self._raise(cfg, f"config handshake failed against {self.uri}")
        p = ((cfg or {}).get("overrides") or {}).get("prefix")
        # normalize exactly like the server's segment matcher: the
        # fragment inserts verbatim BETWEEN slashes, so leading or
        # trailing slashes in the served value must not mint empty
        # path segments
        self._prefix = p.strip("/") if p else None

    def _p(self, suffix: str) -> str:
        """A /v1 route with the config-served prefix applied VERBATIM
        — the spec's prefix is a pre-rendered path fragment (it may be
        multi-segment or carry pre-encoded characters); re-encoding it
        would 404 against conforming endpoints."""
        if self._prefix:
            return f"/v1/{self._prefix}/{suffix}"
        return f"/v1/{suffix}"

    # ----------------------------------------------------------- wire
    def _http(self):
        """A per-thread KEEP-ALIVE connection: a bulk migration issues
        thousands of small requests from a thread pool — per-request
        TCP setup (urllib's model) plus a fresh server thread per
        connection dominates the wall clock; one persistent connection
        per worker thread amortizes both."""
        import http.client
        import urllib.parse

        conn = getattr(self._local, "conn", None)
        if conn is None:
            parts = urllib.parse.urlsplit(self.uri)
            cls = (
                http.client.HTTPSConnection
                if parts.scheme == "https"
                else http.client.HTTPConnection
            )
            conn = cls(parts.hostname, parts.port, timeout=30)
            conn.connect()
            # headers and body go out as separate sends on a
            # persistent connection: without TCP_NODELAY, Nagle +
            # the peer's delayed ACK stalls ~40ms per request
            # (measured: 4ms -> 44ms per register without this)
            import socket

            conn.sock.setsockopt(
                socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
            )
            self._local.conn = conn
            with self._conns_lock:
                self._conns.append(conn)
        return conn

    def _request(
        self, method: str, path: str, body: dict | None = None
    ) -> tuple[int, dict]:
        import http.client

        # close() can only clear the CALLING thread's thread-local
        # connection; without this gate a stray post-close request from
        # another pool thread would reuse a closed socket (opaque error)
        # or — worse, on a GET — retry once by minting a NEW connection
        # against a torn-down server
        if self._closed:
            raise CatalogError(f"REST catalog {self.name!r} is closed")
        data = json.dumps(body).encode() if body is not None else None
        headers = {"Content-Type": "application/json"} if data else {}
        if self._token is not None:
            headers["Authorization"] = f"Bearer {self._token}"
        for attempt in (0, 1):
            conn = self._http()
            try:
                conn.request(method, path, body=data, headers=headers)
                resp = conn.getresponse()
                raw = resp.read()
            except (http.client.HTTPException, OSError):
                try:
                    conn.close()
                except Exception:  # noqa: BLE001 - already broken
                    pass
                self._local.conn = None
                with self._conns_lock:
                    # keep the tracked list bounded at one live
                    # connection per thread over a long-lived catalog
                    try:
                        self._conns.remove(conn)
                    except ValueError:
                        pass
                # stale kept-alive socket: rebuild and retry ONCE, but
                # ONLY for idempotent reads. A mutating verb may have
                # been PROCESSED before the socket died — replaying a
                # landed commit would fail its own CAS requirement and
                # make the caller unlink the live metadata doc, and a
                # replayed register reports a spurious AlreadyExists —
                # so writes surface the ambiguity to the caller instead
                if attempt or method not in ("GET", "HEAD"):
                    raise
                continue
            try:
                payload = json.loads(raw) if raw else {}
            except ValueError:
                payload = {}
            return resp.status, payload
        raise AssertionError("unreachable")

    _ERROR_TYPES = {
        "NoSuchTableException": NoSuchTableError,
        "NoSuchNamespaceException": NoSuchNamespaceError,
        "NamespaceNotEmptyException": NamespaceNotEmptyError,
        "UnprocessableEntityException": UnprocessableError,
        "AlreadyExistsException": TableAlreadyExistsError,
        "CommitFailedException": CatalogError,
        "NotAuthorizedException": CatalogError,
    }

    def _raise(self, payload: dict, default_message: str) -> None:
        err = (payload or {}).get("error") or {}
        message = err.get("message") or default_message
        typ = err.get("type")
        # key on the store's pinned message PREFIX, not a substring: a
        # table literally named "Namespace" must still classify as a
        # table collision, exactly as the local SqlCatalog raises it
        if typ == "AlreadyExistsException" and message.startswith(
            "Namespace already exists:"
        ):
            raise NamespaceAlreadyExistsError(message)
        raise self._ERROR_TYPES.get(typ, CatalogError)(message)

    @staticmethod
    def _ns_path(namespace: Namespace) -> str:
        import urllib.parse

        return urllib.parse.quote("\x1f".join(namespace), safe="")

    @staticmethod
    def _quote(name: str) -> str:
        """Table names percent-encode into the path: a raw '#' would be
        stripped as a URI fragment (silently retargeting the request at
        the WRONG table), '?' starts a query string, and a space breaks
        the HTTP request line."""
        import urllib.parse

        return urllib.parse.quote(name, safe="")

    def _get_pages(self, route: str, params: list[str], fail_msg: str):
        """GET a list route page by page: send pageSize when configured
        and follow the spec's next-page-token until the server stops
        serving one — a huge catalog arrives in bounded pages instead
        of one unbounded JSON document."""
        import urllib.parse

        token: str | None = None
        while True:
            qp = list(params)
            if self._page_size is not None:
                qp.append(f"pageSize={self._page_size}")
            if token is not None:
                qp.append("pageToken=" + urllib.parse.quote(token, safe=""))
            qs = "?" + "&".join(qp) if qp else ""
            status, payload = self._request("GET", self._p(route + qs))
            if status != 200:
                self._raise(payload, fail_msg)
            yield payload
            token = payload.get("next-page-token")
            if token is None:
                return

    # ----------------------------------------------------- namespaces
    def list_namespaces(self, parent: Namespace = ()) -> list[Namespace]:
        import urllib.parse

        params = (
            ["parent=" + urllib.parse.quote("\x1f".join(parent), safe="")]
            if parent
            else []
        )
        out: list[Namespace] = []
        for payload in self._get_pages(
            "namespaces", params, "listNamespaces failed"
        ):
            out.extend(tuple(ns) for ns in payload.get("namespaces", []))
        return out

    def namespace_exists(self, namespace: Namespace) -> bool:
        if not namespace:
            # the empty namespace has no HEAD route; its existence is
            # whether the endpoint serves tables under it
            status, _ = self._request("GET", self._p("namespaces//tables"))
            return status == 200
        status, _ = self._request(
            "HEAD", self._p(f"namespaces/{self._ns_path(namespace)}")
        )
        return status == 204

    def create_namespace(
        self, namespace: Namespace, properties: dict | None = None
    ) -> None:
        body = {"namespace": list(namespace)}
        if properties:
            body["properties"] = properties
        status, payload = self._request(
            "POST", self._p("namespaces"), body
        )
        if status != 200:
            self._raise(payload, "createNamespace failed")

    def namespace_properties(self, namespace: Namespace) -> dict:
        status, payload = self._request(
            "GET", self._p(f"namespaces/{self._ns_path(namespace)}")
        )
        if status != 200:
            self._raise(payload, "loadNamespaceMetadata failed")
        return payload.get("properties") or {}

    def update_namespace_properties(
        self,
        namespace: Namespace,
        removals: list[str] | None = None,
        updates: dict | None = None,
    ) -> dict:
        status, payload = self._request(
            "POST",
            self._p(f"namespaces/{self._ns_path(namespace)}/properties"),
            body={
                "removals": list(removals or []),
                "updates": dict(updates or {}),
            },
        )
        if status != 200:
            self._raise(payload, "updateNamespaceProperties failed")
        return payload

    # --------------------------------------------------------- tables
    def list_tables(self, namespace: Namespace) -> list[TableIdentifier]:
        out: list[TableIdentifier] = []
        for payload in self._get_pages(
            f"namespaces/{self._ns_path(namespace)}/tables",
            [],
            "listTables failed",
        ):
            out.extend(
                TableIdentifier(namespace=tuple(t["namespace"]), name=t["name"])
                for t in payload.get("identifiers", [])
            )
        return out

    def table_exists(self, identifier: TableIdentifier) -> bool:
        status, _ = self._request(
            "HEAD",
            self._p(
                f"namespaces/{self._ns_path(identifier.namespace)}"
                f"/tables/{self._quote(identifier.name)}"
            ),
        )
        return status == 204

    def rename_table(
        self, src: TableIdentifier, dst: TableIdentifier
    ) -> None:
        status, payload = self._request(
            "POST",
            self._p("tables/rename"),
            body={
                "source": {
                    "namespace": list(src.namespace),
                    "name": src.name,
                },
                "destination": {
                    "namespace": list(dst.namespace),
                    "name": dst.name,
                },
            },
        )
        if status not in (200, 204):
            self._raise(payload, f"renameTable failed: {src} -> {dst}")

    def drop_namespace(self, namespace: Namespace) -> bool:
        status, payload = self._request(
            "DELETE", self._p(f"namespaces/{self._ns_path(namespace)}")
        )
        if status == 204:
            return True
        if (
            status == 404
            and ((payload or {}).get("error") or {}).get("type")
            == "NoSuchNamespaceException"
        ):
            # ONLY the namespace-missing 404 means "already gone" — a
            # route/prefix NotFoundException would otherwise read as a
            # successful no-op against a server that never deleted
            return False
        self._raise(payload, f"dropNamespace failed: {namespace}")
        return False  # unreachable: _raise always raises

    def load_table_metadata_location(self, identifier: TableIdentifier) -> str:
        status, payload = self._request(
            "GET",
            self._p(
                f"namespaces/{self._ns_path(identifier.namespace)}"
                f"/tables/{self._quote(identifier.name)}"
            ),
        )
        if status != 200:
            self._raise(payload, f"Table does not exist: {identifier}")
        return payload["metadata-location"]

    def register_table(
        self, identifier: TableIdentifier, metadata_location: str
    ) -> None:
        status, payload = self._request(
            "POST",
            self._p(
                f"namespaces/{self._ns_path(identifier.namespace)}/register"
            ),
            {"name": identifier.name, "metadata-location": metadata_location},
        )
        if status != 200:
            self._raise(payload, f"registerTable failed: {identifier}")

    def drop_table(self, identifier: TableIdentifier, purge: bool = False) -> bool:
        if purge:
            raise CatalogError(PURGE_REFUSAL_MESSAGE)
        status, payload = self._request(
            "DELETE",
            self._p(
                f"namespaces/{self._ns_path(identifier.namespace)}"
                f"/tables/{self._quote(identifier.name)}"
            ),
        )
        if status == 204:
            return True
        if status == 404:
            return False
        self._raise(payload, f"dropTable failed: {identifier}")
        return False  # unreachable: _raise always raises

    def swap_table_metadata_location(
        self,
        identifier: TableIdentifier,
        expected_location: str,
        new_location: str,
    ) -> bool:
        """Commit arbitration over the wire: the spec's commit envelope
        with the pointer-model requirement/update pair; a 409
        ``CommitFailedException`` is a lost race, not an error."""
        status, payload = self._request(
            "POST",
            self._p(
                f"namespaces/{self._ns_path(identifier.namespace)}"
                f"/tables/{self._quote(identifier.name)}"
            ),
            {
                "requirements": [
                    {
                        "type": "assert-current-metadata-location",
                        "metadata-location": expected_location,
                    }
                ],
                "updates": [
                    {
                        "action": "set-current-metadata-location",
                        "metadata-location": new_location,
                    }
                ],
            },
        )
        if status == 200:
            return True
        if (
            status == 409
            and ((payload or {}).get("error") or {}).get("type")
            == "CommitFailedException"
        ):
            return False
        self._raise(payload, f"commit failed: {identifier}")
        return False  # unreachable: _raise always raises

    def close(self) -> None:
        self._closed = True
        with self._conns_lock:
            for conn in self._conns:
                try:
                    conn.close()
                except Exception:  # noqa: BLE001 - best-effort release
                    pass
            self._conns.clear()
        self._local.conn = None
        if self._server is not None:
            self._server.close()
            self._server = None


class GlueCatalog(SqlCatalog):
    """AWS Glue catalog (reference impl:
    ``org.apache.iceberg.aws.glue.GlueCatalog``). Glue databases are a
    flat list, so nested and empty namespaces are rejected."""

    catalog_type = "GLUE"

    def __init__(self, name: str, properties: dict[str, str]):
        warehouse = _require(
            properties,
            "warehouse",
            "Cannot initialize GlueCatalog because warehousePath must not be null or empty",
        )
        self.warehouse = warehouse
        super().__init__(
            name=name,
            uri=os.path.join(warehouse, "glue-catalog.db"),
            max_namespace_levels=1,
            allow_empty_namespace=False,
        )


class DynamoDbCatalog(SqlCatalog):
    """AWS DynamoDB catalog (reference impl:
    ``org.apache.iceberg.aws.dynamodb.DynamoDbCatalog``)."""

    catalog_type = "DYNAMODB"

    def __init__(self, name: str, properties: dict[str, str]):
        warehouse = _require(
            properties,
            "warehouse",
            "Cannot initialize DynamoDbCatalog because warehousePath must not be null or empty",
        )
        self.warehouse = warehouse
        super().__init__(name=name, uri=os.path.join(warehouse, "dynamodb-catalog.db"))


class EcsCatalog(SqlCatalog):
    """Dell ECS catalog (reference impl:
    ``org.apache.iceberg.dell.ecs.EcsCatalog``)."""

    catalog_type = "ECS"

    def __init__(self, name: str, properties: dict[str, str]):
        warehouse = _require(
            properties,
            "warehouse",
            "Cannot initialize EcsCatalog because warehousePath must not be null or empty",
        )
        self.warehouse = warehouse
        super().__init__(name=name, uri=os.path.join(warehouse, "ecs-catalog.db"))
