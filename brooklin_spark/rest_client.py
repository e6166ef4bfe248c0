"""Programmatic + CLI client for the REST facade — the DatastreamRestClient
and DatastreamRestClientCli analogs (datastream-client
DatastreamRestClient.java:139-640; datastream-tools
DatastreamRestClientCli.java:48-57).

The client wraps the HTTP surface rest.py exposes; the CLI mirrors the
reference's operation set (CREATE, READ, PAUSE, RESUME, DELETE, READALL —
MOVE is the §2.9 non-goal: Spark's scheduler owns placement) plus the
engine's extra lifecycle actions (STOP, REWIND) and the partition-pause
surface. Pure stdlib: urllib + argparse.

    python -m brooklin_spark.rest_client --uri http://127.0.0.1:8080 \
        --operation READALL
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.error
import urllib.request


class DatastreamRestError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class DatastreamRestClient:
    """Blocking client over the facade (DatastreamRestClient.java parity:
    get/getAll/create/delete/pause/resume/exists/waitTillDeleted plus the
    engine's stop/rewind/partition-pause actions)."""

    def __init__(self, base_uri: str, principal: str | None = None, timeout: float = 30.0):
        self._base = base_uri.rstrip("/")
        self._principal = principal
        self._timeout = timeout

    # ------------------------------------------------------------ plumbing
    def _call(self, method: str, path: str, body: dict | None = None):
        req = urllib.request.Request(
            f"{self._base}{path}",
            data=json.dumps(body).encode() if body is not None else None,
            method=method,
        )
        req.add_header("Content-Type", "application/json")
        if self._principal:
            req.add_header("X-Principal", self._principal)
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            payload = e.read().decode()
            try:
                msg = json.loads(payload).get("error", payload)
            except json.JSONDecodeError:
                msg = payload
            raise DatastreamRestError(e.code, msg) from None

    # ----------------------------------------------------------------- API
    def get_datastream(self, name: str) -> dict:
        return self._call("GET", f"/datastreams/{name}")

    def get_all_datastreams(self) -> list[dict]:
        return self._call("GET", "/datastreams")

    def create_datastream(self, spec: dict) -> dict:
        return self._call("POST", "/datastreams", spec)

    def update_datastream(self, spec: dict) -> dict:
        return self._call("PUT", f"/datastreams/{spec['name']}", spec)

    def delete_datastream(self, name: str) -> None:
        self._call("DELETE", f"/datastreams/{name}")

    def datastream_exists(self, name: str) -> bool:
        try:
            self.get_datastream(name)
            return True
        except DatastreamRestError as e:
            if e.status == 404:
                return False
            raise

    def wait_till_datastream_is_deleted(self, name: str, timeout_s: float) -> None:
        """DatastreamRestClient.waitTillDatastreamIsDeleted:198 parity."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if not self.datastream_exists(name):
                return
            time.sleep(0.05)
        raise TimeoutError(f"datastream {name!r} still exists after {timeout_s}s")

    def pause(self, name: str, force: bool = False) -> dict:
        return self._call("POST", f"/datastreams/{name}/pause", {"force": force})

    def resume(self, name: str, force: bool = False) -> dict:
        return self._call("POST", f"/datastreams/{name}/resume", {"force": force})

    def stop(self, name: str) -> dict:
        return self._call("POST", f"/datastreams/{name}/stop")

    def rewind(self, name: str) -> dict:
        return self._call("POST", f"/datastreams/{name}/rewind")

    def pause_source_partitions(self, name: str, partitions: list[int]) -> dict:
        return self._call(
            "POST",
            f"/datastreams/{name}/pauseSourcePartitions",
            {"partitions": partitions},
        )

    def resume_source_partitions(self, name: str, partitions: list[int] | None = None) -> dict:
        return self._call(
            "POST",
            f"/datastreams/{name}/resumeSourcePartitions",
            {"partitions": partitions} if partitions is not None else {},
        )

    def paused_source_partitions(self, name: str) -> dict:
        return self._call("GET", f"/datastreams/{name}/pausedSourcePartitions")

    def health(self) -> list[dict]:
        return self._call("GET", "/health")


#: CLI operation set (DatastreamRestClientCli.java:48-57; MOVE is the
#: Spark-scheduler non-goal, STOP/REWIND/partition ops are engine extras)
_OPERATIONS = (
    "CREATE", "READ", "UPDATE", "PAUSE", "RESUME", "STOP", "REWIND",
    "DELETE", "READALL", "HEALTH", "PAUSEPARTITIONS", "RESUMEPARTITIONS",
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="brooklin-spark-rest-cli", description="Console app to manage datastreams."
    )
    ap.add_argument("--uri", "-u", required=True, help="server base uri")
    ap.add_argument("--operation", "-o", required=True, type=str.upper, choices=_OPERATIONS)
    ap.add_argument("--name", "-n", help="datastream name")
    ap.add_argument("--spec", "-s", help="spec JSON (or @file) for CREATE")
    ap.add_argument("--partitions", "-p", help="comma-separated partition ids")
    ap.add_argument("--principal", help="caller principal (X-Principal header)")
    args = ap.parse_args(argv)
    client = DatastreamRestClient(args.uri, principal=args.principal)

    def need_name():
        if not args.name:
            ap.error(f"--name is required for {args.operation}")

    try:
        if args.operation in ("CREATE", "UPDATE"):
            raw = args.spec or ap.error(f"--spec is required for {args.operation}")
            if raw.startswith("@"):
                with open(raw[1:]) as f:
                    raw = f.read()
            parsed = json.loads(raw)
            out = (
                client.create_datastream(parsed)
                if args.operation == "CREATE"
                else client.update_datastream(parsed)
            )
        elif args.operation == "READ":
            need_name()
            out = client.get_datastream(args.name)
        elif args.operation == "READALL":
            out = client.get_all_datastreams()
        elif args.operation == "HEALTH":
            out = client.health()
        elif args.operation == "DELETE":
            need_name()
            client.delete_datastream(args.name)
            out = {"deleted": args.name}
        elif args.operation == "PAUSEPARTITIONS":
            need_name()
            parts = [int(p) for p in (args.partitions or "").split(",") if p != ""]
            out = client.pause_source_partitions(args.name, parts)
        elif args.operation == "RESUMEPARTITIONS":
            need_name()
            parts = (
                [int(p) for p in args.partitions.split(",") if p != ""]
                if args.partitions
                else None
            )
            out = client.resume_source_partitions(args.name, parts)
        else:  # PAUSE / RESUME / STOP / REWIND
            need_name()
            out = getattr(client, args.operation.lower())(args.name)
    except DatastreamRestError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via main() in tests
    sys.exit(main())
