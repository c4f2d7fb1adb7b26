"""spark-submit command assembly for cluster-manager engine launches.

The sandbox launches engines as local Python processes
(gateway/engine_process.py — no YARN/K8s here), but a REAL deployment
submits every engine as its own Spark application.  This module
re-expresses the reference's submission semantics so the gateway can
assemble the exact spark-submit invocation a cluster deployment needs:

- conf-key conversion (SparkProcessBuilder.scala:103-110 —
  ``spark.*`` as-is, ``hadoop.*`` → ``spark.hadoop.*``, anything else
  prefixed ``spark.``);
- cluster-manager/deploy-mode detection + K8s master auto-completion
  from the in-cluster service env (SparkProcessBuilder.scala:75-95);
- YARN: ``spark.yarn.maxAppAttempts=1`` unless set
  (SparkProcessBuilder.scala:323-333, YARN-5617);
- application tagging so ApplicationOperation can find/kill the app:
  YARN ``spark.yarn.tags`` gets ``KYUUBI,<refId>`` appended, K8s gets
  the ``kyuubi-unique-tag`` driver label
  (KyuubiApplicationManager.scala:114-129,199-221);
- K8s pod naming: DNS-1123-sanitized ``kyuubi-<app>-<refId>[-driver]``
  resource names with the reference's length budget (253 minus
  namespace/uid/log-dir reservations; executors further reserve
  ``-exec-<maxint>``) and the forcibly-rewrite fallback
  (KubernetesUtils.scala:131-213);
- proxy-user vs keytab: ``--proxy-user <user>`` only when no
  keytab+principal pair is configured; K8s additionally pins
  SPARK_USER_NAME into driver/executor env
  (SparkProcessBuilder.scala:167-199,370-378).

Everything here is a pure function over (conf, env) — the unit tests
mirror the reference's SparkProcessBuilderSuite assertions.
"""

from __future__ import annotations

import re

MASTER_KEY = "spark.master"
DEPLOY_MODE_KEY = "spark.submit.deployMode"
TAG_KEY = "spark.yarn.tags"
LABEL_KYUUBI_UNIQUE_KEY = "kyuubi-unique-tag"
PRINCIPAL = "spark.kerberos.principal"
KEYTAB = "spark.kerberos.keytab"
INTERNAL_RESOURCE = "spark-internal"
MAIN_CLASS = "org.apache.kyuubi.engine.spark.SparkSQLEngine"
APP_KEY = "spark.app.name"
KUBERNETES_NAMESPACE_KEY = "spark.kubernetes.namespace"
KUBERNETES_DRIVER_POD_NAME = "spark.kubernetes.driver.pod.name"
KUBERNETES_EXECUTOR_POD_NAME_PREFIX = (
    "spark.kubernetes.executor.podNamePrefix"
)
YARN_MAX_APP_ATTEMPTS_KEY = "spark.yarn.maxAppAttempts"

_DRIVER_POD_NAME_MAX_LENGTH = 253
_POD_UID_MAX_LENGTH = 36
_POD_LOGS_DIR_SEPARATOR_LENGTH = 2
_EXECUTOR_POD_NAME_RESERVED_LENGTH = len("-exec-") + len(str(2**31 - 1))


def convert_config_key(key: str) -> str:
    if key.startswith("spark."):
        return key
    if key.startswith("hadoop."):
        return "spark.hadoop." + key
    return "spark." + key


def cluster_manager(conf: dict) -> str | None:
    return conf.get(MASTER_KEY)


def deploy_mode(conf: dict) -> str | None:
    return conf.get(DEPLOY_MODE_KEY)


def is_cluster_mode(conf: dict) -> bool:
    cm = (cluster_manager(conf) or "").lower()
    if cm.startswith("yarn") or cm.startswith("k8s"):
        return (deploy_mode(conf) or "").lower() == "cluster"
    return False


def complete_master_url(conf: dict, env: dict) -> dict:
    """Inside a K8s pod with no explicit master, point spark at the
    in-cluster API server (KUBERNETES_SERVICE_HOST/PORT, https)."""
    if cluster_manager(conf) is None:
        host = env.get("KUBERNETES_SERVICE_HOST")
        port = env.get("KUBERNETES_SERVICE_PORT")
        if host and port:
            conf = dict(conf)
            conf[MASTER_KEY] = f"k8s://https://{host}:{port}"
    return conf


def extra_yarn_conf(conf: dict) -> dict:
    out = {}
    cm = (cluster_manager(conf) or "").lower()
    if cm.startswith("yarn") and YARN_MAX_APP_ATTEMPTS_KEY not in conf:
        out[YARN_MAX_APP_ATTEMPTS_KEY] = "1"
    return out


def tag_application(tag: str, conf: dict) -> dict:
    """Make the engine findable/killable by its ref id: YARN tags and/or
    the K8s driver label; both when the master is not yet known."""
    conf = dict(conf)
    cm = (cluster_manager(conf) or "").upper()

    def yarn_tag():
        prior = conf.get(TAG_KEY)
        base = f"{prior}," if prior else ""
        conf[TAG_KEY] = f"{base}KYUUBI" + (f",{tag}" if tag else "")

    def k8s_tag():
        conf[f"spark.kubernetes.driver.label.{LABEL_KYUUBI_UNIQUE_KEY}"] = tag

    if cm.startswith("YARN"):
        yarn_tag()
    elif cm.startswith("K8S"):
        k8s_tag()
    else:
        yarn_tag()
        k8s_tag()
    return conf


def _resource_name_prefix(app_name: str, ref_id: str | None) -> str:
    s = f"{app_name}-{ref_id}" if ref_id else app_name
    s = s.strip().lower()
    s = re.sub(r"[^a-z0-9\-]", "-", s)
    s = re.sub(r"-+", "-", s)
    s = re.sub(r"^-", "", s)
    s = re.sub(r"^[0-9]", "x", s)
    return s


def _max_driver_pod_name_length(namespace: str) -> int:
    return (
        _DRIVER_POD_NAME_MAX_LENGTH
        - len(namespace)
        - _POD_UID_MAX_LENGTH
        - _POD_LOGS_DIR_SEPARATOR_LENGTH
    )


def generate_driver_pod_name(
    app_name: str, ref_id: str, namespace: str = "default",
    forcibly_rewrite: bool = False,
) -> str:
    prefix = _resource_name_prefix(
        app_name, None if ref_id in app_name else ref_id
    )
    name = (
        f"{prefix}-driver"
        if prefix.startswith("kyuubi-")
        else f"kyuubi-{prefix}-driver"
    )
    if forcibly_rewrite or len(name) > _max_driver_pod_name_length(namespace):
        return f"kyuubi-{ref_id}-driver"
    return name


def generate_executor_pod_name_prefix(
    app_name: str, ref_id: str, namespace: str = "default",
    forcibly_rewrite: bool = False,
) -> str:
    prefix = _resource_name_prefix(
        app_name, None if ref_id in app_name else ref_id
    )
    name = prefix if prefix.startswith("kyuubi-") else f"kyuubi-{prefix}"
    limit = (
        _max_driver_pod_name_length(namespace)
        - _EXECUTOR_POD_NAME_RESERVED_LENGTH
    )
    if forcibly_rewrite or len(name) > limit:
        return f"kyuubi-{ref_id}"
    return name


def append_pod_name_conf(conf: dict, ref_id: str) -> dict:
    out = {}
    cm = (cluster_manager(conf) or "").lower()
    if not cm.startswith("k8s"):
        return out
    app_name = conf.get(APP_KEY, "spark")
    namespace = conf.get(KUBERNETES_NAMESPACE_KEY, "default")
    if KUBERNETES_EXECUTOR_POD_NAME_PREFIX not in conf:
        out[KUBERNETES_EXECUTOR_POD_NAME_PREFIX] = (
            generate_executor_pod_name_prefix(app_name, ref_id, namespace)
        )
    if (deploy_mode(conf) or "").lower() == "cluster":
        if KUBERNETES_DRIVER_POD_NAME not in conf:
            out[KUBERNETES_DRIVER_POD_NAME] = generate_driver_pod_name(
                app_name, ref_id, namespace
            )
    return out


def build_spark_submit_command(
    conf: dict,
    ref_id: str,
    proxy_user: str | None = None,
    spark_submit: str = "spark-submit",
    main_resource: str = INTERNAL_RESOURCE,
    env: dict | None = None,
    do_as_enabled: bool = True,
    app_args: list[str] | None = None,
) -> list[str]:
    """Assemble the full engine spark-submit invocation
    (SparkProcessBuilder.commands, :134-163).

    A ``.py`` main resource submits the engine as a PySpark application
    (spark-submit's PythonRunner path): no ``--class``, and ``app_args``
    follow the resource — this is the executable shape this repo's
    Python engine uses.  The default ``spark-internal`` + ``--class``
    shape mirrors the reference's JVM engine submission.
    """
    env = env or {}
    conf = complete_master_url(conf, env)
    conf = tag_application(ref_id, conf)
    merged = dict(conf)
    merged.update(extra_yarn_conf(merged))
    merged.update(append_pod_name_conf(merged, ref_id))

    cmd = [spark_submit]
    if not main_resource.endswith(".py"):
        cmd += ["--class", MAIN_CLASS]
    for k, v in sorted(merged.items()):
        cmd += ["--conf", f"{convert_config_key(k)}={v}"]

    # keytab beats proxy-user (the reference skips PROXY_USER whenever a
    # usable principal+keytab pair is configured)
    has_keytab = bool(merged.get(PRINCIPAL)) and bool(merged.get(KEYTAB))
    user_for_pods = proxy_user if (do_as_enabled and not has_keytab) else None
    cm = (cluster_manager(merged) or "").upper()
    if user_for_pods and cm.startswith("K8S"):
        cmd += [
            "--conf",
            f"spark.kubernetes.driverEnv.SPARK_USER_NAME={user_for_pods}",
            "--conf",
            f"spark.executorEnv.SPARK_USER_NAME={user_for_pods}",
        ]
    if user_for_pods:
        cmd += ["--proxy-user", user_for_pods]
    cmd.append(main_resource)
    cmd.extend(app_args or [])
    return cmd
