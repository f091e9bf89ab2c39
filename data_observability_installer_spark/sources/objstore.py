"""Object-store commit backend: the conditional-PUT CAS over HTTP.

Modern object stores expose exactly the primitive the commit protocol
needs: *create-if-absent* on a single object. S3 (since 2024) honors
``If-None-Match: *`` on PUT (412 when the key exists); GCS has the
equivalent ``x-goog-if-generation-match: 0``; Azure Blob
``If-None-Match: *``. :class:`HTTPCASBackend` speaks that shape: one
PUT with ``If-None-Match: *`` per claim — 2xx means this writer OWNS
the version, 409/412 means another writer got there first (the loser
then GETs the winner's payload so the local read path sees it).

Deployment shape: the store is the ARBITER and durable copy; the local
``_commits/`` directory stays the read cache, which every claim
(winner or loser) materializes atomically. This is the external-CAS
pattern Delta uses for S3 multi-writer (an authority arbitrates, the
log directory is what readers scan) — on a cluster whose table
directory lives on a shared filesystem, pointing the backend at a
bucket makes concurrent writers safe without any POSIX link(2)
semantics on the data path.

:class:`InMemoryCASServer` is the stdlib stand-in (ThreadingHTTPServer
+ a lock) implementing the same verb semantics, so the backend runs
against a REAL concurrent HTTP arbiter in the conformance suite
(tests/test_backend_conformance.py) — the documented strategy is
tested, not just described. Against AWS/GCS, only the endpoint and
auth header differ.
"""

from __future__ import annotations

import os
import threading
import urllib.error
import urllib.request
import uuid

from .txtable import CommitBackend, _commit_dir, _manifest_path


class HTTPCASBackend(CommitBackend):
    """Commit CAS through HTTP conditional PUT (see module docstring).

    ``endpoint``: base URL of the object store / arbiter.
    ``headers``: extra headers per request (auth tokens etc.).
    Object keys are ``<table_path>/_commits/<version>.json`` with the
    table path URL-safe-flattened, so one arbiter serves many tables.
    """

    def __init__(self, endpoint: str, headers: dict[str, str] | None = None):
        self.endpoint = endpoint.rstrip("/")
        self.headers = dict(headers or {})

    def _key(self, table_path: str, version: int) -> str:
        flat = os.path.abspath(table_path).strip("/").replace("/", "__")
        return f"{self.endpoint}/{flat}/{version}.json"

    def _materialize(self, table_path: str, version: int, payload: bytes) -> None:
        """Atomic local write of the AUTHORITATIVE payload — tmp +
        rename so a concurrent local reader never sees a torn file."""
        d = _commit_dir(table_path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, _manifest_path(table_path, version))

    def claim_version(self, table_path: str, version: int, payload: str) -> bool:
        url = self._key(table_path, version)
        req = urllib.request.Request(
            url, data=payload.encode(), method="PUT",
            headers={"If-None-Match": "*", **self.headers},
        )
        try:
            with urllib.request.urlopen(req):
                pass
        except urllib.error.HTTPError as e:
            if e.code in (409, 412):  # S3: 412; GCS: 412; some stores: 409
                # lost the race: fetch the WINNER's payload so the
                # local read cache reflects the authoritative log
                get = urllib.request.Request(url, headers=self.headers)
                with urllib.request.urlopen(get) as resp:
                    self._materialize(table_path, version, resp.read())
                return False
            raise
        self._materialize(table_path, version, payload.encode())
        return True


class InMemoryCASServer:
    """Stdlib conditional-PUT object-store stand-in for tests: PUT with
    ``If-None-Match: *`` is create-if-absent under one lock (412 when
    the key exists — the S3/GCS/Azure contract), GET serves the stored
    bytes. ThreadingHTTPServer, so concurrent claims genuinely race in
    the server, not in the client."""

    def __init__(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        store: dict[str, bytes] = {}
        lock = threading.Lock()
        self.store = store

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_PUT(self):
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                with lock:
                    if self.headers.get("If-None-Match") == "*" and (
                        self.path in store
                    ):
                        self.send_response(412)
                        self.end_headers()
                        return
                    store[self.path] = body
                self.send_response(201)
                self.end_headers()

            def do_GET(self):
                with lock:
                    body = store.get(self.path)
                if body is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )
        self._thread.start()
        self.endpoint = f"http://127.0.0.1:{self._srv.server_address[1]}"

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=5)
