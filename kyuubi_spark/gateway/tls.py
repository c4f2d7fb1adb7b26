"""TLS for the gateway frontends and the LDAP client — stdlib ``ssl`` only.

The reference treats SSL as first-class server conf:
``kyuubi.frontend.thrift.binary.ssl.enabled`` +
``kyuubi.frontend.ssl.keystore.path``/``.password`` (KyuubiConf.scala:
553-612) and ``kyuubi.frontend.thrift.http.use.SSL`` +
``kyuubi.frontend.thrift.http.ssl.keystore.path`` (KyuubiConf.scala:
945-990).  JKS keystores are JVM-specific; the Python analog accepts PEM
files — the same conf-key names are honored with ``keystore.path``
pointing at a PEM bundle (cert + key, or cert with the key in
``kyuubi.frontend.ssl.key.path``) and ``keystore.password`` as the PEM
key passphrase.

One ``SSLContext`` is built per server and shared by every frontend
(thrift binary, thrift HTTP, REST, Trino) — like the reference, which
feeds one keystore to all listeners.

Client side, ``client_ssl_context`` builds a verifying context from an
optional CA file (self-signed deployments pass the server cert itself);
``insecure=True`` disables verification for dev loops, mirroring
beeline's ``sslTrustStore``-less mode.
"""

from __future__ import annotations

import ssl

# server-side conf keys (reference names; PEM semantics documented above)
SSL_ENABLED_KEY = "kyuubi.frontend.thrift.binary.ssl.enabled"
SSL_HTTP_ENABLED_KEY = "kyuubi.frontend.thrift.http.use.SSL"
SSL_KEYSTORE_PATH_KEY = "kyuubi.frontend.ssl.keystore.path"
SSL_KEYSTORE_PASSWORD_KEY = "kyuubi.frontend.ssl.keystore.password"
SSL_KEY_PATH_KEY = "kyuubi.frontend.ssl.key.path"  # PEM-only addition
SSL_DISALLOWED_PROTOCOLS_KEY = (
    "kyuubi.frontend.thrift.binary.ssl.disallowed.protocols"
)

_TRUTHY = {"true", "1", "yes", "on"}


def _is_true(value) -> bool:
    return str(value).strip().lower() in _TRUTHY


def ssl_enabled(conf: dict | None) -> bool:
    """Either the binary or the http enable key turns the plane on (this
    single-process server shares one context across frontends)."""
    if not conf:
        return False
    return _is_true(conf.get(SSL_ENABLED_KEY, "false")) or _is_true(
        conf.get(SSL_HTTP_ENABLED_KEY, "false")
    )


def server_ssl_context(conf: dict | None) -> ssl.SSLContext | None:
    """Build the server context from conf, or None when SSL is off.

    Raises ValueError when enabled without a keystore path — the
    reference fails server start the same way rather than silently
    serving plaintext.
    """
    if not ssl_enabled(conf):
        return None
    certfile = (conf or {}).get(SSL_KEYSTORE_PATH_KEY, "")
    if not certfile:
        raise ValueError(
            f"{SSL_KEYSTORE_PATH_KEY} must be set when SSL is enabled"
        )
    keyfile = (conf or {}).get(SSL_KEY_PATH_KEY) or None
    password = (conf or {}).get(SSL_KEYSTORE_PASSWORD_KEY) or None
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile=keyfile, password=password)
    # kyuubi.frontend.thrift.binary.ssl.disallowed.protocols defaults to
    # SSLv2,SSLv3 in the reference; stdlib PROTOCOL_TLS_SERVER already
    # refuses SSLv2/v3, so only TLS minimums stated there are applied.
    disallowed = {
        p.strip().upper()
        for p in str(
            (conf or {}).get(SSL_DISALLOWED_PROTOCOLS_KEY, "")
        ).split(",")
        if p.strip()
    }
    if "TLSV1" in disallowed or "TLSV1.1" in disallowed:
        ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    return ctx


def client_ssl_context(
    cafile: str | None = None, insecure: bool = False
) -> ssl.SSLContext:
    """Client context: verify against ``cafile`` (pass the server's own
    PEM cert for self-signed deployments) or the system store; with
    ``insecure`` skip verification entirely (dev only)."""
    ctx = ssl.create_default_context(cafile=cafile)
    if insecure:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    return ctx


def wrap_http_server(httpd, ctx: ssl.SSLContext | None):
    """Wrap an http.server listener's socket for TLS (no-op on None)."""
    if ctx is not None:
        httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    return httpd


def generate_self_signed_cert(directory: str, common_name: str = "localhost"):
    """Write a self-signed cert/key PEM pair for tests and dev servers;
    returns (cert_path, key_path).  Uses the ``cryptography`` package when
    present, else shells out to the ``openssl`` CLI."""
    import os

    cert_path = os.path.join(directory, "server-cert.pem")
    key_path = os.path.join(directory, "server-key.pem")
    try:
        import datetime

        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import rsa
        from cryptography.x509.oid import NameOID

        key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        name = x509.Name(
            [x509.NameAttribute(NameOID.COMMON_NAME, common_name)]
        )
        now = datetime.datetime.now(datetime.timezone.utc)
        cert = (
            x509.CertificateBuilder()
            .subject_name(name)
            .issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(days=1))
            .not_valid_after(now + datetime.timedelta(days=365))
            .add_extension(
                x509.SubjectAlternativeName(
                    [
                        x509.DNSName(common_name),
                        x509.DNSName("localhost"),
                        x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1")),
                    ]
                ),
                critical=False,
            )
            .sign(key, hashes.SHA256())
        )
        with open(key_path, "wb") as f:
            f.write(
                key.private_bytes(
                    serialization.Encoding.PEM,
                    serialization.PrivateFormat.TraditionalOpenSSL,
                    serialization.NoEncryption(),
                )
            )
        with open(cert_path, "wb") as f:
            f.write(cert.public_bytes(serialization.Encoding.PEM))
    except ImportError:  # pragma: no cover - cryptography is present here
        import subprocess

        subprocess.run(
            [
                "openssl", "req", "-x509", "-newkey", "rsa:2048",
                "-keyout", key_path, "-out", cert_path, "-days", "365",
                "-nodes", "-subj", f"/CN={common_name}",
                "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
            ],
            check=True,
            capture_output=True,
        )
    return cert_path, key_path
