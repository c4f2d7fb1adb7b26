"""spark-submit command assembly parity (gateway/spark_submit.py vs the
reference's SparkProcessBuilderSuite assertions: conf-key conversion,
proxy-user/keytab precedence, K8s pod naming + master auto-completion,
YARN tagging + maxAppAttempts)."""

from __future__ import annotations

from kyuubi_spark.gateway import spark_submit as SS


def test_convert_config_key():
    # SparkProcessBuilderSuite "add spark prefix for conf" /
    # "spark conf should be converted with `spark.` prefix"
    assert SS.convert_config_key("spark.driver.memory") == "spark.driver.memory"
    assert (
        SS.convert_config_key("hadoop.fs.defaultFS")
        == "spark.hadoop.hadoop.fs.defaultFS"
    )
    assert SS.convert_config_key("kyuubi.abc") == "spark.kyuubi.abc"


def test_cluster_mode_detection():
    assert not SS.is_cluster_mode({})
    assert not SS.is_cluster_mode({"spark.master": "local[4]"})
    assert not SS.is_cluster_mode(
        {"spark.master": "yarn", "spark.submit.deployMode": "client"}
    )
    assert SS.is_cluster_mode(
        {"spark.master": "yarn", "spark.submit.deployMode": "cluster"}
    )
    assert SS.is_cluster_mode(
        {"spark.master": "k8s://https://h:443",
         "spark.submit.deployMode": "cluster"}
    )


def test_k8s_master_autocompletion():
    conf = SS.complete_master_url(
        {}, {"KUBERNETES_SERVICE_HOST": "kubernetes.default.svc",
             "KUBERNETES_SERVICE_PORT": "443"}
    )
    assert conf["spark.master"] == "k8s://https://kubernetes.default.svc:443"
    # explicit master wins
    conf = SS.complete_master_url(
        {"spark.master": "yarn"},
        {"KUBERNETES_SERVICE_HOST": "h", "KUBERNETES_SERVICE_PORT": "443"},
    )
    assert conf["spark.master"] == "yarn"


def test_yarn_tag_and_max_attempts():
    # "default spark.yarn.maxAppAttempts conf in yarn mode"
    conf = {"spark.master": "yarn"}
    assert SS.extra_yarn_conf(conf) == {"spark.yarn.maxAppAttempts": "1"}
    assert SS.extra_yarn_conf(
        {"spark.master": "yarn", "spark.yarn.maxAppAttempts": "3"}
    ) == {}
    assert SS.extra_yarn_conf({"spark.master": "local"}) == {}

    tagged = SS.tag_application("ref123", {"spark.master": "yarn"})
    assert tagged["spark.yarn.tags"] == "KYUUBI,ref123"
    tagged = SS.tag_application(
        "ref123", {"spark.master": "yarn", "spark.yarn.tags": "mine"}
    )
    assert tagged["spark.yarn.tags"] == "mine,KYUUBI,ref123"


def test_k8s_tag_label():
    tagged = SS.tag_application(
        "ref123", {"spark.master": "k8s://https://h:443"}
    )
    assert (
        tagged["spark.kubernetes.driver.label.kyuubi-unique-tag"] == "ref123"
    )
    # unknown master: BOTH tag planes set
    tagged = SS.tag_application("ref123", {})
    assert tagged["spark.yarn.tags"] == "KYUUBI,ref123"
    assert (
        tagged["spark.kubernetes.driver.label.kyuubi-unique-tag"] == "ref123"
    )


def test_pod_name_generation():
    # KYUUBI #5165 appendDriverPodPrefix/appendExecutorPodPrefix shapes
    name = SS.generate_driver_pod_name("SparkSQL", "abc123")
    assert name == "kyuubi-sparksql-abc123-driver"
    # app name already carrying the ref id is not doubled
    name = SS.generate_driver_pod_name("app-abc123", "abc123")
    assert name == "kyuubi-app-abc123-driver"
    # DNS-1123 sanitization: illegal chars collapse to single dashes,
    # leading digit becomes x
    name = SS.generate_driver_pod_name("9My App!!Name", "r1")
    assert name == "kyuubi-xmy-app-name-r1-driver"
    # over-long names fall back to the ref-id form
    name = SS.generate_driver_pod_name("a" * 300, "r1")
    assert name == "kyuubi-r1-driver"
    # executors: no -driver suffix, tighter budget (reserves -exec-N)
    pre = SS.generate_executor_pod_name_prefix("SparkSQL", "abc123")
    assert pre == "kyuubi-sparksql-abc123"
    pre = SS.generate_executor_pod_name_prefix("a" * 210, "r1")
    assert pre == "kyuubi-r1"
    # forcibly rewrite always uses the ref id
    assert (
        SS.generate_driver_pod_name("app", "r1", forcibly_rewrite=True)
        == "kyuubi-r1-driver"
    )


def test_append_pod_name_conf_only_on_k8s():
    assert SS.append_pod_name_conf({"spark.master": "yarn"}, "r1") == {}
    out = SS.append_pod_name_conf(
        {"spark.master": "k8s://https://h:443",
         "spark.submit.deployMode": "cluster",
         "spark.app.name": "eng"},
        "r1",
    )
    assert out["spark.kubernetes.executor.podNamePrefix"] == "kyuubi-eng-r1"
    assert out["spark.kubernetes.driver.pod.name"] == "kyuubi-eng-r1-driver"
    # client mode: no driver pod name (the driver is not a pod)
    out = SS.append_pod_name_conf(
        {"spark.master": "k8s://https://h:443", "spark.app.name": "eng"},
        "r1",
    )
    assert "spark.kubernetes.driver.pod.name" not in out
    # user-set names are never overwritten
    out = SS.append_pod_name_conf(
        {"spark.master": "k8s://https://h:443",
         "spark.kubernetes.executor.podNamePrefix": "mine"},
        "r1",
    )
    assert "spark.kubernetes.executor.podNamePrefix" not in out


def test_proxy_user_or_keytab():
    # SparkProcessBuilderSuite "proxy user or keytab"
    cmd = SS.build_spark_submit_command(
        {"spark.master": "yarn"}, "r1", proxy_user="alice"
    )
    i = cmd.index("--proxy-user")
    assert cmd[i + 1] == "alice"
    # a usable principal+keytab pair suppresses --proxy-user
    cmd = SS.build_spark_submit_command(
        {"spark.master": "yarn",
         "spark.kerberos.principal": "svc@REALM",
         "spark.kerberos.keytab": "/etc/svc.keytab"},
        "r1", proxy_user="alice",
    )
    assert "--proxy-user" not in cmd
    # doAs disabled: no proxy user either
    cmd = SS.build_spark_submit_command(
        {"spark.master": "yarn"}, "r1", proxy_user="alice",
        do_as_enabled=False,
    )
    assert "--proxy-user" not in cmd


def test_full_command_shape():
    cmd = SS.build_spark_submit_command(
        {"spark.master": "yarn", "kyuubi.frontend.protocols": "THRIFT_BINARY",
         "hadoop.fs.defaultFS": "hdfs://nn"},
        "ref42", proxy_user="bob", spark_submit="/opt/spark/bin/spark-submit",
    )
    assert cmd[0] == "/opt/spark/bin/spark-submit"
    assert cmd[1:3] == [
        "--class", "org.apache.kyuubi.engine.spark.SparkSQLEngine"
    ]
    assert cmd[-1] == "spark-internal"
    confs = {
        c.split("=", 1)[0]: c.split("=", 1)[1]
        for c in cmd if "=" in c and c.startswith("spark.")
    }
    assert confs["spark.yarn.tags"] == "KYUUBI,ref42"
    assert confs["spark.yarn.maxAppAttempts"] == "1"
    assert confs["spark.hadoop.hadoop.fs.defaultFS"] == "hdfs://nn"
    assert confs["spark.kyuubi.frontend.protocols"] == "THRIFT_BINARY"


def test_k8s_spark_user_name_env():
    # "SparkProcessBuilder build spark engine with SPARK_USER_NAME"
    cmd = SS.build_spark_submit_command(
        {"spark.master": "k8s://https://h:443"}, "r1", proxy_user="carol"
    )
    joined = " ".join(cmd)
    assert "spark.kubernetes.driverEnv.SPARK_USER_NAME=carol" in joined
    assert "spark.executorEnv.SPARK_USER_NAME=carol" in joined


def test_builder_switches_to_spark_submit_mode():
    """kyuubi.engine.spark.submit.enabled flips EngineProcessBuilder
    from the local python engine to the assembled spark-submit command
    (the cluster-deployment launch path)."""
    from kyuubi_spark.gateway.engine_process import EngineProcessBuilder

    b = EngineProcessBuilder({
        "kyuubi.engine.spark.submit.enabled": "true",
        "spark.master": "yarn",
        "kyuubi.session.proxy.user": "dana",
    })
    cmd = b.command("/kyuubi/user/dana", "ref9", "/tmp/reg.db")
    assert cmd[0] == "spark-submit"
    assert "--class" in cmd and cmd[-1] == "spark-internal"
    joined = " ".join(cmd)
    assert "spark.yarn.tags=KYUUBI,ref9" in joined
    assert "spark.kyuubi.engine.namespace=/kyuubi/user/dana" in joined
    assert "--proxy-user dana" in joined

    # default stays the local python engine
    b = EngineProcessBuilder({})
    cmd = b.command("/kyuubi/user/dana", "ref9", "/tmp/reg.db")
    assert cmd[1:3] == ["-m", "kyuubi_spark.gateway.engine_main"]
