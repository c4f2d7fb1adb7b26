"""Engine-secure internal authentication — auto-issued intra-cluster
credentials for gateway→engine connections.

Reference: ``EngineSecureAuthenticationProviderImpl.scala`` authenticates
an internal connection by validating the SASL *password* as a token
minted by ``InternalSecurityAccessor`` from a cluster-shared secret
(``kyuubi.engine.security.enabled`` + ``kyuubi.engine.security.secret.
provider``, KyuubiConf.scala:2921-2969) — no static per-deployment
credential.  The reference's token is AES-CTR-encrypted JSON carrying
``issueDate``/``maxDate``; the JVM-free analog here is an HMAC-SHA256-
signed timestamp pair (same primitives as gateway/credentials.py — the
stdlib has no AES, and a signed identifier gives the same guarantee for
an AUTH token: only secret holders can mint, expiry is tamper-proof).

Secret sharing follows the reference's two providers:

- ``simple``: ``kyuubi.engine.security.secret.provider.simple.secret``
  conf value (testing only, like the reference).
- discovery-backed (the ZooKeeper provider's analog): the first server
  to come up generates a random secret and publishes it at a well-known
  znode in the discovery store; every later server/gateway reads the
  SAME node — so federation works with NO static credential in conf.
"""

from __future__ import annotations

import hashlib
import hmac
import secrets as _secrets
import time

from kyuubi_spark.gateway.auth import (
    AuthenticationError,
    PasswdAuthenticationProvider,
)

ENGINE_SECURITY_ENABLED_KEY = "kyuubi.engine.security.enabled"
SIMPLE_SECRET_KEY = "kyuubi.engine.security.secret.provider.simple.secret"
TOKEN_MAX_LIFETIME_KEY = "kyuubi.engine.security.token.max.lifetime"

# discovery node where the cluster secret lives (ZooKeeperEngineSecurity
# SecretProvider analog — the store itself is the trust boundary, as ZK
# ACLs are in the reference)
SECRET_NODE = "/kyuubi/engine-secret"

# the SASL user internal connections present; the engine replies with the
# real end-user identity carried in OpenSession (proxy-style), so this
# marker never becomes a session owner
INTERNAL_USER = "__kyuubi_internal__"


class InternalSecurityAccessor:
    """issueToken/authToken (InternalSecurityAccessor.scala:34-49)."""

    def __init__(self, secret: bytes, max_lifetime_ms: int = 600_000):
        if not secret:
            raise ValueError("engine-security secret must be non-empty")
        self._secret = secret
        self.max_lifetime_ms = int(max_lifetime_ms)

    def _sign(self, payload: str) -> str:
        return hmac.new(
            self._secret, payload.encode("utf-8"), hashlib.sha256
        ).hexdigest()

    def issue_token(self) -> str:
        issue_ms = int(time.time() * 1000)
        payload = f"{issue_ms};{self.max_lifetime_ms}"
        return f"{payload};{self._sign(payload)}"

    def auth_token(self, token: str) -> None:
        """Raises AuthenticationError on forged/expired tokens
        (authToken: invalid -> 'Invalid engine access token', stale ->
        'expired')."""
        try:
            issue_s, max_s, sig = token.rsplit(";", 2)
            payload = f"{issue_s};{max_s}"
            issue_ms, max_ms = int(issue_s), int(max_s)
        except ValueError as e:
            raise AuthenticationError("Invalid engine access token") from e
        if not hmac.compare_digest(sig, self._sign(payload)):
            raise AuthenticationError("Invalid engine access token")
        if issue_ms + max_ms < int(time.time() * 1000):
            raise AuthenticationError("The engine access token is expired")


class EngineSecureAuthenticationProvider(PasswdAuthenticationProvider):
    """The SASL password IS the internal token
    (EngineSecureAuthenticationProviderImpl.scala)."""

    def __init__(self, accessor: InternalSecurityAccessor):
        self.accessor = accessor

    def authenticate(self, user: str, password: str) -> None:
        self.accessor.auth_token(password)


class CompositeAuthenticationProvider(PasswdAuthenticationProvider):
    """Internal connections (user == INTERNAL_USER) validate their token;
    everyone else goes through the configured user provider.  The
    reference splits these across processes (engines run ONLY the
    engine-secure provider); this single process plays both the server
    and engine roles, so its frontend composes the two — the internal
    path never falls back to the user path or vice versa."""

    def __init__(self, internal: EngineSecureAuthenticationProvider,
                 user_provider: PasswdAuthenticationProvider | None):
        self.internal = internal
        self.user_provider = user_provider

    def authenticate(self, user: str, password: str) -> None:
        if user == INTERNAL_USER:
            self.internal.authenticate(user, password)
            return
        if self.user_provider is None:
            raise AuthenticationError(
                f"only internal connections may authenticate as-is; "
                f"unknown user {user!r}"
            )
        self.user_provider.authenticate(user, password)


def get_or_create_secret(discovery, node: str = SECRET_NODE) -> bytes:
    """Read the cluster secret from the discovery store, minting and
    publishing it if absent (first-server-wins under the store's write
    lock — the ZooKeeper secret-provider shape)."""
    from kyuubi_spark.gateway.discovery import DiscoveryStoreError

    with discovery.try_with_lock(f"{node}.init-lock", timeout_ms=10_000):
        try:
            data = discovery.get_data(node)
            if data:
                return bytes.fromhex(data.decode("ascii"))
        except DiscoveryStoreError:
            pass  # no node yet — mint below
        # Only the MISSING-NODE case may mint: a transient store error
        # (sqlite OperationalError, corrupted file) must propagate, or a
        # rebooting server would overwrite the published cluster secret
        # and split internal auth across the fleet.
        secret = _secrets.token_bytes(32)
        discovery.create(node, "PERSISTENT", secret.hex().encode("ascii"))
        return secret


def build_accessor(conf: dict | None, discovery=None):
    """-> InternalSecurityAccessor or None when engine security is off.

    Secret source precedence mirrors the reference's provider conf:
    ``simple`` conf secret when set, else the discovery-backed provider;
    enabling without either fails server start."""
    conf = conf or {}
    if str(conf.get(ENGINE_SECURITY_ENABLED_KEY, "false")).lower() not in (
        "true", "1", "yes",
    ):
        return None
    lifetime = int(conf.get(TOKEN_MAX_LIFETIME_KEY, 600_000))
    simple = conf.get(SIMPLE_SECRET_KEY)
    if simple:
        return InternalSecurityAccessor(
            str(simple).encode("utf-8"), lifetime
        )
    if discovery is not None:
        discovery.create_client()  # idempotent; may predate server start
        return InternalSecurityAccessor(
            get_or_create_secret(discovery), lifetime
        )
    raise ValueError(
        f"{ENGINE_SECURITY_ENABLED_KEY} needs {SIMPLE_SECRET_KEY} or a "
        "discovery client to share the secret"
    )
