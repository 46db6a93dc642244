"""Authentication for the serving API.

TPU-native counterpart of the reference's ``bouncer`` crate
(ref: crates/bouncer/src/*): register/login/logout/me handlers, hashed
credentials, signed bearer tokens, and request middleware. The reference
uses Argon2 + JWT over Postgres; this stdlib-only equivalent uses
PBKDF2-HMAC-SHA256 (600k rounds) + HMAC-signed expiring tokens over a
JSON member store — same surface, no external dependencies. Anonymous
"lurker" access stays available for read-only endpoints
(ref: bouncer Lurker).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import pathlib
import secrets
import time

PBKDF2_ROUNDS = 600_000
TOKEN_TTL_S = 24 * 3600


class Members:
    """JSON-file member store (ref: bouncer Member/Session records)."""

    def __init__(self, path: str | pathlib.Path, secret: bytes | None = None):
        self.path = pathlib.Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.secret = secret or self._load_secret()
        self._members = self._load()

    def _load_secret(self) -> bytes:
        sp = self.path.with_suffix(".secret")
        if sp.exists():
            return sp.read_bytes()
        s = secrets.token_bytes(32)
        sp.write_bytes(s)
        os.chmod(sp, 0o600)
        return s

    def _load(self) -> dict:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return {}

    def _save(self) -> None:
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self._members))
        tmp.replace(self.path)

    # --- credentials -------------------------------------------------------

    def register(self, username: str, password: str) -> bool:
        if username in self._members:
            return False
        salt = secrets.token_bytes(16)
        digest = hashlib.pbkdf2_hmac(
            "sha256", password.encode(), salt, PBKDF2_ROUNDS
        )
        self._members[username] = {
            "salt": salt.hex(), "hash": digest.hex(), "created": time.time(),
        }
        self._save()
        return True

    def verify(self, username: str, password: str) -> bool:
        m = self._members.get(username)
        if m is None:
            # constant-ish time: still run the KDF
            hashlib.pbkdf2_hmac("sha256", password.encode(), b"x" * 16,
                                PBKDF2_ROUNDS)
            return False
        digest = hashlib.pbkdf2_hmac(
            "sha256", password.encode(), bytes.fromhex(m["salt"]), PBKDF2_ROUNDS
        )
        return hmac.compare_digest(digest.hex(), m["hash"])

    # --- tokens (HMAC-signed, expiring; ref: bouncer claims.rs) ------------

    def issue(self, username: str, ttl_s: int = TOKEN_TTL_S) -> str:
        claims = {"sub": username, "exp": time.time() + ttl_s,
                  "jti": secrets.token_hex(8)}
        body = base64.urlsafe_b64encode(json.dumps(claims).encode())
        sig = hmac.new(self.secret, body, hashlib.sha256).hexdigest()
        return f"{body.decode()}.{sig}"

    def validate(self, token: str) -> str | None:
        """Returns the username, or None for invalid/expired tokens."""
        try:
            body, sig = token.rsplit(".", 1)
            want = hmac.new(self.secret, body.encode(), hashlib.sha256).hexdigest()
            if not hmac.compare_digest(sig, want):
                return None
            claims = json.loads(base64.urlsafe_b64decode(body))
            if claims["exp"] < time.time():
                return None
            if claims["sub"] not in self._members:
                return None
            return claims["sub"]
        except Exception:
            return None


def add_auth_routes(app, members: Members, protect: tuple = ("/strategy",)):
    """Attach /auth endpoints + bearer middleware to an aiohttp app
    (ref: crates/portal/src/lib.rs /auth scope)."""
    from aiohttp import web

    routes = web.RouteTableDef()

    @routes.post("/auth/register")
    async def register(request):
        p = await request.json()
        ok = members.register(p["username"], p["password"])
        if not ok:
            return web.json_response({"error": "exists"}, status=409)
        return web.json_response({"token": members.issue(p["username"])})

    @routes.post("/auth/login")
    async def login(request):
        p = await request.json()
        if not members.verify(p["username"], p["password"]):
            return web.json_response({"error": "bad credentials"}, status=401)
        return web.json_response({"token": members.issue(p["username"])})

    @routes.get("/auth/me")
    async def me(request):
        user = request.get("user")
        if user is None:
            return web.json_response({"user": None, "lurker": True})
        return web.json_response({"user": user})

    @web.middleware
    async def bearer(request, handler):
        auth = request.headers.get("Authorization", "")
        if auth.startswith("Bearer "):
            request["user"] = members.validate(auth[7:])
        else:
            request["user"] = None
        if any(request.path.startswith(p) for p in protect) \
                and request["user"] is None:
            return web.json_response({"error": "unauthorized"}, status=401)
        return await handler(request)

    app.middlewares.append(bearer)
    app.add_routes(routes)
    return app
