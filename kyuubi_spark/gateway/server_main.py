"""KyuubiServer assembly — one process wiring every frontend over one
engine, with discovery registration and graceful shutdown.

Counterpart of the reference's KyuubiServer.scala: ``start()`` brings up,
in order, the metrics/event services (already attached to the Engine),
the thrift BINARY frontend, the thrift HTTP frontend, the REST v1
frontend, and the Trino frontend — all sharing the SAME Engine (sessions
opened through any frontend live in one SessionManager, so `KYUUBI DESC
SESSION`, metrics, and the limiter see every connection); then registers
the server's instance in the discovery namespace (ServiceDiscovery
.scala: the server publishes itself exactly like an engine does).
``stop()`` tears down in reverse and deregisters.

Usage (also the ``python -m kyuubi_spark.gateway.server_main`` entry):

    server = KyuubiServer(spark)           # or KyuubiServer() to build one
    server.start()
    print(server.endpoints())              # {"thrift_binary": (h, p), ...}
    ...
    server.stop()
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kyuubi_spark.gateway.engine import Engine

SERVER_NAMESPACE = "/kyuubi/servers"


class PeriodicGCService:
    """KyuubiServer's background janitor (PeriodicGCService.scala):
    periodically sweeps idle sessions, releases idle pooled engines, and
    expires unused credentials — one daemon timer, explicit ``tick()``
    for deterministic tests."""

    def __init__(self, engine: Engine, interval_s: float = 60.0,
                 pool=None, credentials=None):
        import threading

        self.engine = engine
        self.pool = pool
        self.credentials = credentials
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: "threading.Thread | None" = None

    def tick(self) -> dict[str, int]:
        out = {"sessions": self.engine.sessions.sweep_idle()}
        if self.pool is not None:
            out["engines"] = self.pool.sweep_idle()
        if self.credentials is not None:
            out["credentials"] = self.credentials.sweep_expired()
        mgr = getattr(self.engine, "process_manager", None)
        if mgr is not None:
            out["engine_processes"] = mgr.reap()
        return out

    def start(self) -> "PeriodicGCService":
        import threading

        def loop():
            while not self._stop.wait(self.interval_s):
                try:
                    self.tick()
                except Exception:
                    pass

        self._thread = threading.Thread(target=loop, name="periodic-gc", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()


class KyuubiServer:
    def __init__(
        self,
        spark: SparkSession | None = None,
        conf: dict | None = None,
        host: str = "127.0.0.1",
        discovery=None,
    ):
        self.engine = Engine(spark=spark, conf=conf)
        self.host = host
        self.discovery = discovery
        # kyuubi.authentication: NONE (default) | JDBC | LDAP | CUSTOM —
        # builds the PasswdAuthenticationProvider ALL FOUR frontends
        # enforce: SASL/PLAIN on the binary thrift wire, Basic on the
        # HTTP thrift transport, REST, and Trino (one filter, principal
        # outranks any request-claimed identity)
        # TLS: one server context shared by all four frontends when
        # kyuubi.frontend.thrift.binary.ssl.enabled or .http.use.SSL is on
        # (reference KyuubiConf.scala:553-612,945-990; gateway/tls.py)
        from kyuubi_spark.gateway.tls import server_ssl_context

        self.ssl_context = server_ssl_context(conf)
        method = (conf or {}).get("kyuubi.authentication", "NONE")
        if str(method).upper() == "NONE":
            self.auth = None
        else:
            from kyuubi_spark.gateway.auth import get_authentication_provider

            self.auth = get_authentication_provider(str(method), conf)
        if discovery is not None:
            # engine-side lookup (remote sessions resolve namespaces here)
            self.engine.discovery = discovery
        # engine-secure internal auth (kyuubi.engine.security.enabled):
        # an auto-issued cluster secret replaces static engine credentials
        # — internal connections authenticate with a minted token, and
        # this server's own frontends accept them alongside user auth
        from kyuubi_spark.gateway.internal_auth import (
            CompositeAuthenticationProvider,
            EngineSecureAuthenticationProvider,
            build_accessor,
        )

        self.internal_accessor = build_accessor(conf, discovery)
        # kyuubi.engine.launch.enabled: spawn real engine OS processes per
        # share level (EngineRef.getOrCreate lifecycle) instead of the
        # in-process pool — needs a file-backed discovery store the
        # children can open (gateway/engine_process.py)
        self.process_manager = None
        if str((conf or {}).get(
            "kyuubi.engine.launch.enabled", "false"
        )).lower() in ("true", "1", "yes"):
            from kyuubi_spark.gateway.engine_process import (
                EngineProcessManager,
            )

            if discovery is None:
                raise ValueError(
                    "kyuubi.engine.launch.enabled needs a file-backed "
                    "discovery client"
                )
            self.process_manager = EngineProcessManager(discovery, conf)
            self.engine.process_manager = self.process_manager
            self.engine.launch_engines = True
        if self.internal_accessor is not None:
            # outbound: remote sessions opened through this engine mint
            # tokens instead of reading kyuubi.engine.thrift.user/password
            self.engine.internal_accessor = self.internal_accessor
            self.auth = CompositeAuthenticationProvider(
                EngineSecureAuthenticationProvider(self.internal_accessor),
                self.auth,
            )
        self.thrift = None
        self.thrift_http = None
        self.rest = None
        self.trino = None
        self.gc = PeriodicGCService(self.engine)
        self._node_path: str | None = None

    def start(self) -> "KyuubiServer":
        from kyuubi_spark.gateway.rest import RestGateway
        from kyuubi_spark.gateway.thrift import ThriftFrontendService
        from kyuubi_spark.gateway.trino import TrinoGateway

        # one server-wide delegation-token plane shared by both thrift
        # transports (the reference issues/verifies tokens per server, not
        # per frontend — a token from the binary port renews over HTTP)
        from kyuubi_spark.gateway.credentials import DelegationTokenManager

        self.tokens = DelegationTokenManager()
        self.thrift = ThriftFrontendService(
            self.engine, host=self.host, auth=self.auth, tokens=self.tokens,
            ssl_context=self.ssl_context,
        ).start()
        self.thrift_http = ThriftFrontendService(
            self.engine, host=self.host, transport="http", auth=self.auth,
            tokens=self.tokens, ssl_context=self.ssl_context,
        ).start()
        self.rest = RestGateway(
            self.engine, host=self.host, auth=self.auth,
            ssl_context=self.ssl_context,
        ).start()
        self.trino = TrinoGateway(
            self.engine, host=self.host, auth=self.auth,
            ssl_context=self.ssl_context,
        ).start()
        self.gc.start()
        if self.discovery is not None:
            self.discovery.create_client()
            self._node_path = self.discovery.create_and_get_service_node(
                SERVER_NAMESPACE, f"{self.thrift.host}:{self.thrift.port}"
            )
        return self

    def endpoints(self) -> dict[str, tuple[str, int]]:
        return {
            "thrift_binary": (self.thrift.host, self.thrift.port),
            "thrift_http": (self.thrift_http.host, self.thrift_http.port),
            "rest": (self.host, self.rest.port),
            "trino": (self.trino.host, self.trino.port),
        }

    def stop(self) -> None:
        if self.discovery is not None and self._node_path:
            try:
                self.discovery.delete(self._node_path)
            finally:
                self._node_path = None
        self.gc.stop()
        for svc in (self.trino, self.rest, self.thrift_http, self.thrift):
            if svc is not None:
                try:
                    svc.stop()
                except Exception:
                    pass
        # close every remaining session (any frontend) through the engine
        for s in list(self.engine.sessions._sessions.values()):
            try:
                self.engine.close_session(s.handle)
            except Exception:
                pass
        if self.process_manager is not None:
            self.process_manager.stop_all()


def main() -> None:  # pragma: no cover - manual entry point
    import signal
    import sys
    import threading

    server = KyuubiServer().start()
    for name, (h, p) in server.endpoints().items():
        print(f"{name}: {h}:{p}")
    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *a: stop.set())
    signal.signal(signal.SIGTERM, lambda *a: stop.set())
    stop.wait()
    server.stop()
    sys.exit(0)


if __name__ == "__main__":  # pragma: no cover
    main()
