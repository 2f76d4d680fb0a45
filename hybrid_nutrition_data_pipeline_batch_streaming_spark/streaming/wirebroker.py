"""In-process TCP line-protocol broker: the Kafka wire path, stood in.

The sandbox has no Kafka broker or client jar, so the engine's S1/S2 rows
were config-builders plus a Python-source stand-in. This module closes the
remaining gap — REAL BYTES OVER A REAL SOCKET — with a minimal
produce/fetch/commit broker speaking newline-delimited UTF-8:

    PRODUCE <topic> <json-value>        -> OK <offset>
    END <topic>                         -> OK <end-offset>
    FETCH <topic> <start> <end>         -> MSG <offset> <json-value> ... DONE
    COMMIT <group> <topic> <offset>     -> OK
    COMMITTED <group> <topic>           -> OK <offset|-1>
    QUIT                                -> (closes connection)

Semantics mirror the reference consumer/producer pair:

- append-only per-topic log, offsets dense from 0 — Kafka's single-partition
  topic model (`producer/produce_items.py:30-41` sends, the broker assigns);
- consumer groups with MANUAL commit: the reference disables auto-commit
  and commits after each processed record (`consumer/consume_items.py:27-29`
  ``enable_auto_commit=False``, `:107` ``consumer.commit()``); here COMMIT
  stores the group's next-offset-to-read and COMMITTED replays it, so a
  group resumes where it left off even WITHOUT a Spark checkpoint;
- fetch is offset-ranged and repeatable (no destructive pop), which is what
  makes Spark-side exactly-once possible: the checkpoint replays an offset
  range and the broker serves the same bytes.

The broker is a plain threaded TCP server (one thread per connection, state
under one lock) — it is test infrastructure standing in for Kafka, not a
distributed log. The SOURCE side (sources/wire_source.py) is the part that
must be production-shaped: ranged fetches from executor tasks, offsets in
the streaming checkpoint, group commit on epoch completion.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one connection, many commands
        broker: WireBroker = self.server.broker  # type: ignore[attr-defined]
        while True:
            line = self.rfile.readline()
            if not line:
                return
            try:
                reply = broker._dispatch(line.decode("utf-8").rstrip("\r\n"))
            except Exception as ex:  # malformed input never kills the server
                reply = [f"ERR {type(ex).__name__}: {ex}"]
            if reply is None:  # QUIT
                return
            self.wfile.write(("\n".join(reply) + "\n").encode("utf-8"))
            self.wfile.flush()


class _Server(socketserver.ThreadingTCPServer):
    daemon_threads = True
    allow_reuse_address = True


class WireBroker:
    """Threaded in-process broker. ``start()`` binds an ephemeral port."""

    def __init__(self, host: str = "127.0.0.1") -> None:
        self._host = host
        self._lock = threading.Lock()
        self._topics: dict[str, list[str]] = {}
        self._commits: dict[tuple[str, str], int] = {}
        self._server: _Server | None = None
        self._thread: threading.Thread | None = None

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> tuple[str, int]:
        self._server = _Server((self._host, 0), _Handler)
        self._server.broker = self  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self.address

    @property
    def address(self) -> tuple[str, int]:
        assert self._server is not None, "broker not started"
        return self._server.server_address[:2]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def __enter__(self) -> "WireBroker":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- protocol -----------------------------------------------------------
    def _dispatch(self, line: str) -> list[str] | None:
        cmd, _, rest = line.partition(" ")
        cmd = cmd.upper()
        if cmd == "QUIT":
            return None
        if cmd == "PRODUCE":
            topic, _, payload = rest.partition(" ")
            value = json.loads(payload)
            if not isinstance(value, str):
                return ["ERR value must be a JSON string"]
            with self._lock:
                log = self._topics.setdefault(topic, [])
                log.append(value)
                return [f"OK {len(log) - 1}"]
        if cmd == "END":
            with self._lock:
                return [f"OK {len(self._topics.get(rest, []))}"]
        if cmd == "FETCH":
            topic, start_s, end_s = rest.split(" ")
            start, end = int(start_s), int(end_s)
            with self._lock:
                log = self._topics.get(topic, [])
                chunk = list(enumerate(log[start:end], start))
            out = [f"MSG {off} {json.dumps(v)}" for off, v in chunk]
            out.append("DONE")
            return out
        if cmd == "COMMIT":
            group, topic, off_s = rest.split(" ")
            with self._lock:
                self._commits[(group, topic)] = int(off_s)
            return ["OK"]
        if cmd == "COMMITTED":
            group, topic = rest.split(" ")
            with self._lock:
                return [f"OK {self._commits.get((group, topic), -1)}"]
        return [f"ERR unknown command {cmd!r}"]


class WireClient:
    """Blocking line-protocol client; safe to construct inside executor
    tasks (one short-lived connection per call site, like a Kafka client's
    per-task consumer)."""

    def __init__(self, host: str, port: int, timeout: float = 10.0) -> None:
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rfile = self._sock.makefile("rb")

    def _send(self, line: str) -> None:
        self._sock.sendall((line + "\n").encode("utf-8"))

    def _recv_line(self) -> str:
        raw = self._rfile.readline()
        if not raw:
            raise ConnectionError("broker closed the connection")
        return raw.decode("utf-8").rstrip("\r\n")

    def _expect_ok(self) -> str:
        reply = self._recv_line()
        if not reply.startswith("OK"):
            raise RuntimeError(f"broker error: {reply}")
        return reply[3:]

    def produce(self, topic: str, value: str) -> int:
        self._send(f"PRODUCE {topic} {json.dumps(value)}")
        return int(self._expect_ok())

    def end_offset(self, topic: str) -> int:
        self._send(f"END {topic}")
        return int(self._expect_ok())

    def fetch(self, topic: str, start: int, end: int) -> list[tuple[int, str]]:
        self._send(f"FETCH {topic} {start} {end}")
        out: list[tuple[int, str]] = []
        while True:
            reply = self._recv_line()
            if reply == "DONE":
                return out
            if not reply.startswith("MSG "):
                raise RuntimeError(f"broker error: {reply}")
            _, off, payload = reply.split(" ", 2)
            out.append((int(off), json.loads(payload)))

    def commit(self, group: str, topic: str, offset: int) -> None:
        self._send(f"COMMIT {group} {topic} {offset}")
        self._expect_ok()

    def committed(self, group: str, topic: str) -> int:
        self._send(f"COMMITTED {group} {topic}")
        return int(self._expect_ok())

    def close(self) -> None:
        try:
            self._send("QUIT")
        except OSError:
            pass
        self._rfile.close()
        self._sock.close()

    def __enter__(self) -> "WireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def produce_dataframe(df, host: str, port: int, topic: str,
                      value_col: str = "item_name") -> None:
    """Wire PRODUCER from executors (S2): each partition opens its own
    connection and streams its rows — the reference's paced driver loop
    (`produce_items.py:30-41`) turned into a partitioned write. Offset
    assignment is the broker's, so cross-partition arrival order is
    nondeterministic exactly like multi-producer Kafka."""

    def _send(rows) -> None:
        client = WireClient(host, port)
        try:
            for row in rows:
                client.produce(topic, row[value_col])
        finally:
            client.close()

    df.select(value_col).foreachPartition(_send)
