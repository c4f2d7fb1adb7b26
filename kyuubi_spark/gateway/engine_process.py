"""Gateway-spawned engine OS processes — EngineRef.getOrCreate for real.

The reference's core multi-tenancy mechanism: on session open, the server
resolves the share-level engine space in discovery and, on miss, LAUNCHES
a separate engine process under the discovery launch lock, polling the
registry until the child registers (or fast-failing when the child dies),
then forwards the session to it over thrift
(kyuubi-server/.../engine/EngineRef.scala:74,108-118,164-191,224-330;
SparkProcessBuilder.scala:69,141,466).  gateway/pool.py keeps the
in-process analog (one JVM can hold one SparkContext); THIS module is the
process-level lifecycle:

- ``EngineProcessBuilder`` assembles the child command — a
  ``python -m kyuubi_spark.gateway.engine_main`` run carrying namespace /
  ref-id / the shared discovery path / ``--conf`` pairs, the
  spark-submit analog of SparkProcessBuilder;
- ``EngineProcessManager.get_or_create`` is EngineRef.getOrCreate:
  resolve → (on miss, under ``tryWithLock``) re-resolve → launch → poll
  ``get_engine_by_ref_id`` with the init timeout, surfacing the child's
  stderr tail when it exits non-zero.  A discovered node whose endpoint
  no longer accepts connections (engine crashed) is treated as stale:
  its nodes are deleted and the engine relaunched — the reference gets
  the same effect from ZK ephemerals dying with the engine's session;
- sessions opened with ``kyuubi.engine.launch.enabled=true`` route
  through ``open_process_session`` → a ``ProcessEngineSession`` (the
  existing remote.py thrift hop, with internal auth and TLS when
  configured) whose close() lets a CONNECTION-level engine die (the
  engine self-terminates at zero sessions; the manager reaps the PID).
  USER-level engines are shared by every session of that user and
  outlive any one of them, expiring on the ENGINE-side idle TTL.

Isolation this buys over the pool: an engine crash kills one user's
queries only; per-user memory/CPU come from the engine's own JVM.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import threading
import time
import uuid

from kyuubi_spark.gateway.remote import RemoteEngineSession

LAUNCH_ENABLED_KEY = "kyuubi.engine.launch.enabled"
SHARE_LEVEL_KEY = "kyuubi.engine.share.level"
INIT_TIMEOUT_KEY = "kyuubi.session.engine.initialize.timeout"

# conf keys forwarded from the gateway into every launched engine
_FORWARD_PREFIXES = (
    "kyuubi.engine.",
    "kyuubi.session.engine.",
    "kyuubi.frontend.ssl.",
    "kyuubi.frontend.thrift.binary.ssl.",
    "spark.",
)


def _truthy(v) -> bool:
    return str(v).lower() in ("true", "1", "yes")


class EngineProcessBuilder:
    """Child-command assembly (SparkProcessBuilder.scala:69-141 shape:
    executable + mainClass + --conf k=v pairs, env carrying the code
    path)."""

    def __init__(self, conf: dict | None = None):
        self.conf = dict(conf or {})

    def command(
        self, namespace: str, ref_id: str, discovery_path: str,
        extra_conf: dict | None = None,
    ) -> list[str]:
        merged = {
            k: v
            for k, v in self.conf.items()
            if any(k.startswith(p) for p in _FORWARD_PREFIXES)
        }
        merged.update(extra_conf or {})
        # cluster-manager submission (kyuubi.engine.spark.submit.enabled):
        # assemble the real spark-submit invocation — YARN/K8s tagging,
        # pod naming, proxy-user/keytab rules (gateway/spark_submit.py,
        # SparkProcessBuilder parity).  A local master EXECUTES: the
        # engine is a PySpark application, so the primary resource is
        # engine_main.py (spark-submit's PythonRunner path) carrying the
        # namespace/ref-id/discovery wiring as app args — the
        # SparkProcessBuilder → SparkSQLEngine lifecycle end-to-end.
        # YARN/K8s masters keep the reference's JVM engine shape
        # (--class SparkSQLEngine, spark-internal): assembly-only here,
        # there is no cluster manager in the sandbox.
        if _truthy(merged.get("kyuubi.engine.spark.submit.enabled", "")):
            from kyuubi_spark.gateway.spark_submit import (
                build_spark_submit_command,
            )

            spark_conf = {
                k: v
                for k, v in merged.items()
                if k != "kyuubi.engine.spark.submit.enabled"
            }
            spark_conf.setdefault("kyuubi.engine.namespace", namespace)
            spark_conf.setdefault("kyuubi.ha.addresses", discovery_path)
            proxy = (extra_conf or {}).get(
                "kyuubi.session.proxy.user"
            ) or self.conf.get("kyuubi.session.proxy.user")
            spark_submit_bin = merged.get(
                "kyuubi.engine.spark.submit.path", "spark-submit"
            )
            master = spark_conf.get("spark.master") or spark_conf.get(
                "kyuubi.engine.spark.master"
            )
            if master is None or master.startswith("local"):
                master = master or "local[2]"
                spark_conf["spark.master"] = master
                spark_conf.setdefault("spark.ui.enabled", "false")
                engine_file = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "engine_main.py",
                )
                app_args = [
                    "--namespace", namespace,
                    "--ref-id", ref_id,
                    "--discovery", discovery_path,
                ]
                for k, v in sorted(merged.items()):
                    if k != "kyuubi.engine.spark.submit.enabled":
                        app_args += ["--conf", f"{k}={v}"]
                # no --proxy-user on a local master: impersonation needs
                # the cluster's Hadoop proxy-user grants; a local engine
                # runs as the gateway user by definition
                return build_spark_submit_command(
                    spark_conf,
                    ref_id,
                    proxy_user=None,
                    spark_submit=spark_submit_bin,
                    main_resource=engine_file,
                    app_args=app_args,
                )
            return build_spark_submit_command(
                spark_conf,
                ref_id,
                proxy_user=proxy,
                spark_submit=spark_submit_bin,
            )
        cmd = [
            sys.executable, "-m", "kyuubi_spark.gateway.engine_main",
            "--namespace", namespace,
            "--ref-id", ref_id,
            "--discovery", discovery_path,
        ]
        for k, v in sorted(merged.items()):
            cmd += ["--conf", f"{k}={v}"]
        return cmd

    def env(self) -> dict:
        env = dict(os.environ)
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        env["PYTHONPATH"] = (
            pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
        # spark-submit launches: pin the driver python to the gateway's
        # interpreter so engine_main runs with the same environment
        # (PythonRunner honors these; harmless for direct python children)
        env.setdefault("PYSPARK_PYTHON", sys.executable)
        env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
        return env


class ManagedEngine:
    """One launched child: PID + captured stderr for fast-fail
    diagnostics (ProcBuilder keeps the engine log the same way)."""

    def __init__(self, proc: subprocess.Popen, namespace: str, ref_id: str,
                 stderr_path: str, command: list[str] | None = None):
        self.proc = proc
        self.namespace = namespace
        self.ref_id = ref_id
        self.stderr_path = stderr_path
        self.launch_time = time.time()
        self.command = list(command or [])
        # app-level launch fields (AdminResource engine listing shape):
        # how was this engine submitted, to which master, in which mode
        exe = os.path.basename(self.command[0]) if self.command else ""
        self.launch_kind = (
            "spark-submit" if exe.startswith("spark-submit") else "python"
        )
        confs = {}
        for i, tok in enumerate(self.command):
            if tok == "--conf" and i + 1 < len(self.command):
                k, _, v = self.command[i + 1].partition("=")
                confs.setdefault(k, v)
        self.master = confs.get("spark.master") or confs.get(
            "kyuubi.engine.spark.master"
        )
        self.deploy_mode = confs.get("spark.submit.deployMode", "client")

    @property
    def pid(self) -> int:
        return self.proc.pid

    def alive(self) -> bool:
        return self.proc.poll() is None

    def describe(self) -> dict:
        """Admin-facing snapshot (AdminResource.scala engine listing +
        the ProcBuilder log the reference keeps per engine)."""
        alive = self.alive()
        return {
            "namespace": self.namespace,
            "engineRefId": self.ref_id,
            "pid": self.pid,
            "alive": alive,
            "uptimeSec": round(time.time() - self.launch_time, 1),
            "exitCode": None if alive else self.proc.poll(),
            "logTail": "" if alive else self.stderr_tail(5),
            "logPath": self.stderr_path,
            "launchKind": self.launch_kind,
            "master": self.master,
            "deployMode": self.deploy_mode,
        }

    def stderr_tail(self, n: int = 30) -> str:
        try:
            with open(self.stderr_path, errors="replace") as f:
                return "".join(f.readlines()[-n:])
        except OSError:
            return ""

    def terminate(self, timeout: float = 10.0) -> None:
        if self.alive():
            # closing stdin is the parent-death signal; SIGTERM follows
            try:
                if self.proc.stdin:
                    self.proc.stdin.close()
            except OSError:
                pass
            self.proc.terminate()
        try:
            self.proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            self.proc.kill()
            self.proc.wait(timeout=5.0)


class EngineProcessManager:
    """EngineRef.getOrCreate + KyuubiApplicationManager teardown over OS
    processes.  ``discovery`` must be shareable across processes — a
    FILE-backed SqliteDiscoveryClient or a TcpDiscoveryClient — because
    the child connects to the same ``_path``."""

    def __init__(self, discovery, conf: dict | None = None,
                 work_dir: str | None = None):
        if getattr(discovery, "_path", ":memory:") == ":memory:":
            raise ValueError(
                "engine processes need a file-backed or tcp:// discovery "
                "store (in-memory registries are invisible across "
                "processes)"
            )
        discovery.create_client()
        self.discovery = discovery
        self.conf = dict(conf or {})
        self.builder = EngineProcessBuilder(self.conf)
        import tempfile

        self.work_dir = work_dir or tempfile.mkdtemp(prefix="kyuubi-engines-")
        self._engines: dict[str, ManagedEngine] = {}  # namespace -> child
        self._lock = threading.RLock()

    # -- engine space (EngineRef.engineSpace, :175-196) -------------------

    @staticmethod
    def engine_space(share_level: str, user: str, group: str | None = None,
                     connection_id: str | None = None) -> str:
        level = share_level.upper()
        if level == "CONNECTION":
            return f"/kyuubi/connection/{connection_id}"
        if level == "USER":
            return f"/kyuubi/user/{user}"
        if level == "GROUP":
            return f"/kyuubi/group/{group or user}"
        return "/kyuubi/server/shared"

    # -- liveness ----------------------------------------------------------

    @staticmethod
    def _endpoint_alive(host: str, port: int, timeout: float = 1.0) -> bool:
        try:
            with socket.create_connection((host, port), timeout=timeout):
                return True
        except OSError:
            return False

    def _drop_stale_nodes(self, namespace: str) -> None:
        for info in self.discovery.get_service_nodes_info(namespace):
            try:
                self.discovery.delete(f"{namespace}/{info.node_name}")
            except Exception:
                pass

    # -- getOrCreate (EngineRef.scala:372-400 + create :224-330) ----------

    def get_or_create(self, namespace: str,
                      session_conf: dict | None = None) -> tuple[str, int]:
        resolved = self._resolve_live(namespace)
        if resolved is not None:
            return resolved
        with self.discovery.try_with_lock(
            f"{namespace}.launch-lock", timeout_ms=120_000
        ):
            resolved = self._resolve_live(namespace)  # loser re-resolves
            if resolved is not None:
                return resolved
            return self._launch(namespace, session_conf)

    def _resolve_live(self, namespace: str) -> tuple[str, int] | None:
        """Resolve a live endpoint, probing PER NODE: only nodes whose own
        host:port fails the liveness check are deregistered (ADVICE r08 —
        a blanket namespace sweep would deregister a live engine that
        merely coexists with a stale node, orphaning it until idle TTL
        and launching a duplicate)."""
        nodes = self.discovery.get_service_nodes_info(namespace)
        live: tuple[str, int] | None = None
        any_dead = False
        for info in nodes:
            if self._endpoint_alive(info.host, info.port):
                if live is None:
                    live = (info.host, info.port)
            else:
                # this node's engine crashed without deregistering —
                # clear just this corpse
                any_dead = True
                try:
                    self.discovery.delete(f"{namespace}/{info.node_name}")
                except Exception:
                    pass
        if live is None and any_dead:
            # every registered node was a corpse: reap our child record
            # so the caller's relaunch starts clean
            with self._lock:
                dead = self._engines.pop(namespace, None)
            if dead is not None:
                dead.terminate(timeout=2.0)
        return live

    def _launch(self, namespace: str,
                session_conf: dict | None) -> tuple[str, int]:
        ref_id = uuid.uuid4().hex
        extra = {
            k: v
            for k, v in (session_conf or {}).items()
            if any(k.startswith(p) for p in _FORWARD_PREFIXES)
        }
        cmd = self.builder.command(
            namespace, ref_id, self.discovery._path, extra
        )
        stderr_path = os.path.join(self.work_dir, f"engine-{ref_id}.log")
        with open(stderr_path, "ab") as logf:
            # "Launching engine:\n<cmd>" (EngineRef.scala:283) — the first
            # line of every engine log is the exact command
            logf.write(
                ("Launching engine:\n" + " ".join(cmd) + "\n").encode()
            )
        proc = subprocess.Popen(
            cmd,
            stdin=subprocess.PIPE,  # held open; EOF = gateway died
            stdout=open(stderr_path, "ab"),
            stderr=subprocess.STDOUT,
            cwd=self.work_dir,
            env=self.builder.env(),
        )
        child = ManagedEngine(proc, namespace, ref_id, stderr_path, cmd)
        timeout = float(self.conf.get(INIT_TIMEOUT_KEY, 120.0))
        deadline = time.time() + timeout
        # EngineRef.create's poll loop: registry hit wins; child exit
        # fast-fails with its log; the deadline kills a hung launch
        while time.time() < deadline:
            found = self.discovery.get_engine_by_ref_id(namespace, ref_id)
            if found is not None:
                with self._lock:
                    self._engines[namespace] = child
                return found
            if not child.alive():
                raise RuntimeError(
                    f"engine process for {namespace} exited with "
                    f"{proc.returncode} before registering:\n"
                    f"{child.stderr_tail()}"
                )
            time.sleep(0.2)
        child.terminate()
        raise TimeoutError(
            f"engine for {namespace} did not register within {timeout}s "
            f"({INIT_TIMEOUT_KEY}):\n{child.stderr_tail()}"
        )

    # -- lifecycle ---------------------------------------------------------

    def reap(self) -> int:
        """Collect children that self-terminated (CONNECTION close / idle
        TTL) — the PeriodicGC hook."""
        reaped = 0
        with self._lock:
            for ns, child in list(self._engines.items()):
                if not child.alive():
                    self._engines.pop(ns)
                    reaped += 1
        return reaped

    def stop_all(self) -> None:
        with self._lock:
            engines, self._engines = list(self._engines.values()), {}
        for child in engines:
            child.terminate()
            self._drop_stale_nodes(child.namespace)

    @property
    def engine_count(self) -> int:
        with self._lock:
            return sum(1 for e in self._engines.values() if e.alive())

    def describe_engines(self) -> list[dict]:
        """Launched-engine snapshots enriched with the discovery node
        (instance + registered attributes) — the data KYUUBI DESC ENGINE
        and REST /admin/engine serve for process engines."""
        with self._lock:
            children = list(self._engines.values())
        out = []
        for child in children:
            d = child.describe()
            try:
                for n in self.discovery.get_service_nodes_info(
                    child.namespace
                ):
                    if n.engine_ref_id == child.ref_id:
                        d["instance"] = f"{n.host}:{n.port}"
                        d["attributes"] = n.attributes
                        break
            except Exception:
                pass
            out.append(d)
        return out


class ProcessEngineSession(RemoteEngineSession):
    """A forwarded session whose engine is a gateway-launched process.

    close() closes the remote session first (the engine sees its count
    drop and, at CONNECTION level, exits), then gives the manager a
    chance to reap."""

    def __init__(self, engine, user: str, conf: dict,
                 manager: EngineProcessManager, namespace: str):
        self.manager = manager
        self.namespace = namespace
        super().__init__(engine, user, conf)

    def execute_statement(self, statement: str,
                          conf_overlay: dict | None = None,
                          run_async: bool = False):
        # KYUUBI DESC ENGINE is the GATEWAY's answer (DescribeEngine
        # .scala runs on the server against the session's EngineRef):
        # for a launched engine it must describe the OS process — PID,
        # uptime, namespace, discovery instance — not forward into the
        # child, which would describe itself with no process context.
        from kyuubi_spark.gateway import server as SRV

        if SRV.parse_server_dsl(statement) == "engine":
            return self._describe_engine_op()
        return super().execute_statement(
            statement, conf_overlay=conf_overlay, run_async=run_async
        )

    def _describe_engine_op(self):
        import json

        from kyuubi_spark.gateway import operations as OPS

        info = next(
            (
                d
                for d in self.manager.describe_engines()
                if d["namespace"] == self.namespace
            ),
            {},
        )
        node_attrs = dict(info.get("attributes") or {})
        if "pid" in node_attrs:
            # under spark-submit the engine registers ITS python pid; the
            # managed pid below is the submit JVM — keep both visible
            node_attrs["enginePid"] = node_attrs.pop("pid")
        attrs = {
            **node_attrs,  # discovery node strings (appId/appName/master)
            "pid": info.get("pid"),  # live process fields take precedence
            "launchKind": info.get("launchKind"),
            "namespace": self.namespace,
            "alive": info.get("alive"),
            "uptimeSec": info.get("uptimeSec"),
            "logPath": info.get("logPath"),
        }
        fields = [
            ("ENGINE_ID", OPS._S), ("ENGINE_NAME", OPS._S),
            ("ENGINE_URL", OPS._S), ("ENGINE_INSTANCE", OPS._S),
            ("ENGINE_VERSION", OPS._S), ("ENGINE_ATTRIBUTES", OPS._S),
        ]
        rows = [(
            info.get("engineRefId", ""),
            "kyuubi-engine-process",
            info.get("instance", ""),
            info.get("instance", ""),
            self.engine.get_info()["ENGINE_VERSION"],
            json.dumps(attrs, sort_keys=True),
        )]
        op = OPS.MetadataOperation(self)
        op._execute = lambda: op._finish(fields, rows)  # type: ignore[method-assign]
        op.run()
        self.operations[op.handle.id] = op
        return op

    def close(self) -> None:
        try:
            super().close()
        finally:
            # CONNECTION-level children exit ~0.5s after the close; a
            # bounded wait keeps `close then assert dead` deterministic
            # without penalizing shared engines (their count stays >0 or
            # they ride the idle TTL)
            with self.manager._lock:
                child = self.manager._engines.get(self.namespace)
            if child is not None and self.namespace.startswith(
                "/kyuubi/connection/"
            ):
                try:
                    child.proc.wait(timeout=15.0)
                except subprocess.TimeoutExpired:
                    pass
            self.manager.reap()


def open_process_session(engine, user: str, conf: dict):
    """SessionManager hook: route an opening session to a launched
    engine (KyuubiSessionImpl.openEngineSession).  Requires
    ``engine.process_manager`` (wired by KyuubiServer when
    kyuubi.engine.launch.enabled is on)."""
    manager = getattr(engine, "process_manager", None)
    if manager is None:
        raise ValueError(
            f"{LAUNCH_ENABLED_KEY} needs a process manager on the gateway "
            "(KyuubiServer wires one when launch mode is enabled)"
        )
    conf = dict(conf or {})

    def _conf(key, default=None):
        return conf.get(key, manager.conf.get(key, default))

    share_level = _conf(SHARE_LEVEL_KEY, "USER")
    connection_id = uuid.uuid4().hex
    namespace = manager.engine_space(
        share_level, user, conf.get("kyuubi.session.group"), connection_id
    )
    # subdomain / engine pool (EngineRef.subdomain, EngineRef.scala
    # :118-140): an explicit subdomain nests the engine space one level;
    # a pool size > 0 round-robins a POLLING counter over
    # engine-pool-0..N-1 subdomains — N engine processes per user
    subdomain = _conf("kyuubi.engine.share.level.subdomain")
    pool_size = int(_conf("kyuubi.engine.pool.size", 0) or 0)
    if share_level != "CONNECTION":
        if pool_size > 0 and not subdomain:
            seq = manager.discovery.get_and_increment(
                f"{namespace}.pool-seq"
            )
            subdomain = f"engine-pool-{seq % pool_size}"
        if subdomain:
            namespace = f"{namespace}/{subdomain}"
    conf.setdefault(SHARE_LEVEL_KEY, share_level)
    host, port = manager.get_or_create(namespace, conf)
    conf["kyuubi.engine.thrift.host"] = host
    conf["kyuubi.engine.thrift.port"] = str(port)
    return ProcessEngineSession(engine, user, conf, manager, namespace)
