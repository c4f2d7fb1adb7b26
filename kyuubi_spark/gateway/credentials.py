"""Delegation tokens + per-user credential renewal — single-node analog of
the reference's credential plane.

Two reference components are re-expressed here without Kerberos/Hadoop
(neither exists in this deployment):

1. **Delegation tokens** (KyuubiTBinaryFrontendService.scala:546-566 —
   Get/Cancel/RenewDelegationToken thrift ops; token issuance delegated to
   Hadoop's AbstractDelegationTokenSecretManager).  Here a token is an
   HMAC-SHA256-signed record ``user;renewer;issue_ms;max_ms;seq`` — the
   same properties as Hadoop's: unforgeable without the server secret,
   bounded lifetime with a renewable window, cancelable by id, and
   verifiable statelessly (signature) plus revocably (server-side set).

2. **Per-user credential refresh with session epochs**
   (HadoopCredentialsManager.scala:52-97: one CredentialsRef per user with
   an epoch counter bumped on every renewal; each session remembers the epoch
   it last SENT to its engine and re-sends only when stale; an idle
   timeout drops unused user refs).  ``CredentialsManager`` keeps that
   exact epoch protocol; the renewal executor becomes an explicit
   ``renew_if_due`` tick (callable from a daemon thread or the session
   sweep, deterministic for tests).
"""

from __future__ import annotations

import hashlib
import hmac
import secrets
import threading
import time


class TokenError(Exception):
    pass


class DelegationTokenManager:
    """Issue/renew/cancel/verify HMAC-signed delegation tokens.

    Wire format: ``user;renewer;issue_ms;max_ms;seq;hexsig`` where hexsig
    = HMAC-SHA256(secret, payload).  ``renew`` extends the CURRENT
    expiry inside the max lifetime (Hadoop token semantics: renewals
    cannot outlive maxDate); ``cancel`` revokes server-side.
    """

    def __init__(
        self,
        secret: bytes | None = None,
        renew_interval_ms: int = 3_600_000,
        max_lifetime_ms: int = 7 * 24 * 3_600_000,
    ):
        self._secret = secret or secrets.token_bytes(32)
        self.renew_interval_ms = renew_interval_ms
        self.max_lifetime_ms = max_lifetime_ms
        self._lock = threading.Lock()
        self._seq = 0
        # seq -> current expiry (ms); absence after issue = canceled
        self._expiry: dict[int, int] = {}

    def _sign(self, payload: str) -> str:
        return hmac.new(
            self._secret, payload.encode("utf-8"), hashlib.sha256
        ).hexdigest()

    def issue(self, user: str, renewer: str = "") -> str:
        if ";" in user or ";" in renewer:
            raise TokenError("user/renewer must not contain ';'")
        now = int(time.time() * 1000)
        with self._lock:
            self._seq += 1
            seq = self._seq
            self._expiry[seq] = now + self.renew_interval_ms
        payload = f"{user};{renewer};{now};{now + self.max_lifetime_ms};{seq}"
        return f"{payload};{self._sign(payload)}"

    def _parse(self, token: str) -> tuple[str, str, int, int, int]:
        try:
            user, renewer, issue_ms, max_ms, seq, sig = token.rsplit(";", 5)
        except ValueError as e:
            raise TokenError("malformed token") from e
        payload = f"{user};{renewer};{issue_ms};{max_ms};{seq}"
        if not hmac.compare_digest(sig, self._sign(payload)):
            raise TokenError("invalid token signature")
        return user, renewer, int(issue_ms), int(max_ms), int(seq)

    def verify(self, token: str) -> str:
        """Returns the token's user; raises on forged/expired/canceled."""
        user, _renewer, _issue, max_ms, seq = self._parse(token)
        now = int(time.time() * 1000)
        with self._lock:
            exp = self._expiry.get(seq)
        if exp is None:
            raise TokenError("token canceled or unknown")
        if now > exp:
            raise TokenError("token expired (renew required)")
        if now > max_ms:
            raise TokenError("token past max lifetime")
        return user

    def renew(self, token: str, renewer: str = "") -> int:
        """Extend expiry by one renew interval, capped at max lifetime;
        returns the new expiry (ms). Only the named renewer (or the owner
        when no renewer was named) may renew — Hadoop's renewer check."""
        user, named_renewer, _issue, max_ms, seq = self._parse(token)
        if named_renewer and renewer != named_renewer:
            raise TokenError(f"renewer {renewer!r} is not {named_renewer!r}")
        now = int(time.time() * 1000)
        with self._lock:
            if seq not in self._expiry:
                raise TokenError("token canceled or unknown")
            new_exp = min(now + self.renew_interval_ms, max_ms)
            self._expiry[seq] = new_exp
            return new_exp

    def cancel(self, token: str) -> None:
        *_rest, seq = self._parse(token)[:5]
        with self._lock:
            self._expiry.pop(seq, None)


class CredentialsRef:
    """Per-user credentials + epoch (HadoopCredentialsManager's
    CredentialsRef: epoch starts at -1, bumped on each renewal)."""

    def __init__(self, user: str):
        self.user = user
        self.epoch = -1
        self.creds: str | None = None
        self.renewed_at = 0.0
        self.last_access = time.time()


class CredentialsManager:
    """Epoch-compared credential propagation to engines.

    ``send_credentials_if_needed(session_id, user, send_fn)`` implements
    HadoopCredentialsManager.scala:52-66 exactly: look up (or create) the
    user's CredentialsRef, renew if due, compare its epoch with the
    session's remembered epoch, call ``send_fn(creds)`` only when stale,
    and record the session epoch only after the send succeeds.
    """

    def __init__(
        self,
        tokens: DelegationTokenManager | None = None,
        renewal_interval_s: float = 3600.0,
        credentials_timeout_s: float = 7 * 24 * 3600.0,
    ):
        self.tokens = tokens or DelegationTokenManager()
        self.renewal_interval_s = renewal_interval_s
        self.credentials_timeout_s = credentials_timeout_s
        self._lock = threading.Lock()
        self._user_refs: dict[str, CredentialsRef] = {}
        self._session_epochs: dict[str, int] = {}

    def _ref(self, user: str) -> CredentialsRef:
        ref = self._user_refs.get(user)
        if ref is None:
            ref = self._user_refs.setdefault(user, CredentialsRef(user))
        ref.last_access = time.time()
        return ref

    def renew_if_due(self, user: str) -> bool:
        """Obtain fresh credentials when the interval elapsed (or never
        obtained); bumps the epoch. Returns True if renewed."""
        with self._lock:
            ref = self._ref(user)
            now = time.time()
            if ref.creds is not None and now - ref.renewed_at < self.renewal_interval_s:
                return False
            ref.creds = self.tokens.issue(user)
            ref.renewed_at = now
            ref.epoch += 1
            return True

    def send_credentials_if_needed(
        self, session_id: str, user: str, send_fn
    ) -> bool:
        """Send to the engine only when the session's epoch is stale;
        session epoch advances only on successful send. Returns True if a
        send happened."""
        self.renew_if_due(user)
        with self._lock:
            ref = self._ref(user)
            if self._session_epochs.get(session_id, -1) == ref.epoch:
                return False
            creds, epoch = ref.creds, ref.epoch
        send_fn(creds)  # outside the lock; raises propagate (epoch not set)
        with self._lock:
            self._session_epochs[session_id] = epoch
        return True

    def remove_session_epoch(self, session_id: str) -> None:
        with self._lock:
            self._session_epochs.pop(session_id, None)

    def sweep_expired(self) -> int:
        """Drop user refs idle beyond the credentials timeout
        (credentialsTimeoutChecker)."""
        now = time.time()
        with self._lock:
            stale = [
                u
                for u, r in self._user_refs.items()
                if now - r.last_access > self.credentials_timeout_s
            ]
            for u in stale:
                del self._user_refs[u]
            return len(stale)
