"""RBAC + row-level security (reference src/Access/).

The reference keeps users, roles, grants and row policies in an
AccessControlManager (src/Access/AccessControlManager.h) and enforces them
per-query through ContextAccess (src/Access/ContextAccess.cpp) and
RowPolicyCache (src/Access/RowPolicyCache.cpp).  This module is the
session-scoped analogue:

* users / roles / grants — ``CREATE USER`` / ``CREATE ROLE`` /
  ``GRANT [SELECT[(cols)]] ON t TO principal`` through the SQL frontend;
  a SELECT statement referencing a table the current user has no grant on
  raises ``AccessDeniedError`` (reference ErrorCodes::ACCESS_DENIED).
* column grants — ``GRANT SELECT(c1, c2) ON t`` swaps the table's view to
  a projection of just the granted columns for the statement's duration,
  so any reference to an ungranted column fails analysis naturally (the
  reference checks the column list in ContextAccess::checkAccessImpl).
* row policies — ``CREATE ROW POLICY p ON t [AS PERMISSIVE|RESTRICTIVE]
  [FOR SELECT] USING cond [TO ALL | principals]``.  The per-user condition
  mix is exactly RowPolicyCache::ConditionsMixer (RowPolicyCache.cpp:44-73):
  ``AND(restrictive...) AND OR(permissive...)`` — and, like the reference,
  a user covered by at least one policy but by NO permissive policy sees
  no rows (the empty OR folds to FALSE), while a user covered by no policy
  at all sees everything.

Scale note: enforcement is a view swap around statement ANALYSIS only —
the filter/projection lands inside the logical plan, so Catalyst pushes
policy predicates into the parquet scan like any WHERE clause.  Nothing
here touches data on the driver.

The "default" user is the reference's built-in full-access user
(programs/server/users.yaml analogue): grant checks are skipped for it,
but row policies still apply when their TO clause covers it.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class AccessDeniedError(PermissionError):
    """reference ErrorCodes::ACCESS_DENIED (497)."""


class UnknownAccessEntityError(KeyError):
    """reference ErrorCodes::UNKNOWN_USER / UNKNOWN_ROLE / ACCESS_ENTITY_NOT_FOUND."""


@dataclass
class RowPolicy:
    # reference src/Access/RowPolicy.h — (short_name, table) is the key;
    # only SELECT_FILTER exists (INSERT/UPDATE checks are `#if 0` there too)
    name: str
    table: str
    condition: str
    restrictive: bool = False
    to_all: bool = False
    to_roles: frozenset = field(default_factory=frozenset)

    def applies_to(self, user: str, roles: set) -> bool:
        return self.to_all or user in self.to_roles or bool(roles & self.to_roles)


class AccessControl:
    """Session AccessControlManager (reference AccessControlManager.h)."""

    DEFAULT_USER = "default"

    def __init__(self) -> None:
        self.users: dict[str, set] = {}  # name -> granted role names
        self.roles: set = set()
        # principal -> table -> frozenset(columns) | None (= all columns);
        # table "*" = all tables (reference AccessRights "*.*")
        self.grants: dict[str, dict] = {}
        self.row_policies: dict[tuple, RowPolicy] = {}
        self.current_user: str = self.DEFAULT_USER

    # -- entity DDL ---------------------------------------------------------

    def create_user(self, name: str, if_not_exists: bool = False) -> None:
        if name in self.users and not if_not_exists:
            raise UnknownAccessEntityError(f"user {name!r} already exists")
        self.users.setdefault(name, set())

    def drop_user(self, name: str, if_exists: bool = False) -> bool:
        if name not in self.users:
            if if_exists:
                return False
            raise UnknownAccessEntityError(f"UNKNOWN_USER: {name!r}")
        del self.users[name]
        self.grants.pop(name, None)
        if self.current_user == name:
            self.current_user = self.DEFAULT_USER
        return True

    def create_role(self, name: str, if_not_exists: bool = False) -> None:
        if name in self.roles and not if_not_exists:
            raise UnknownAccessEntityError(f"role {name!r} already exists")
        self.roles.add(name)

    def drop_role(self, name: str, if_exists: bool = False) -> bool:
        if name not in self.roles:
            if if_exists:
                return False
            raise UnknownAccessEntityError(f"UNKNOWN_ROLE: {name!r}")
        self.roles.discard(name)
        self.grants.pop(name, None)
        for granted in self.users.values():
            granted.discard(name)
        return True

    # -- grants --------------------------------------------------------------

    def _check_principal(self, principal: str) -> None:
        if principal not in self.users and principal not in self.roles:
            raise UnknownAccessEntityError(
                f"ACCESS_ENTITY_NOT_FOUND: no user or role {principal!r}"
            )

    def grant_role(self, role: str, user: str) -> None:
        if role not in self.roles:
            raise UnknownAccessEntityError(f"UNKNOWN_ROLE: {role!r}")
        if user not in self.users:
            raise UnknownAccessEntityError(f"UNKNOWN_USER: {user!r}")
        self.users[user].add(role)

    def grant_select(self, table: str, principal: str, columns=None) -> None:
        self._check_principal(principal)
        cols = frozenset(columns) if columns else None
        tbl_grants = self.grants.setdefault(principal, {})
        if cols is not None and tbl_grants.get(table):
            # widening grants union their column sets (AccessRights::grant)
            prev = tbl_grants[table]
            cols = None if prev is None else frozenset(prev | cols)
        tbl_grants[table] = cols

    def revoke_select(self, table: str, principal: str) -> bool:
        return self.grants.get(principal, {}).pop(table, "?") != "?"

    def set_user(self, name: str) -> None:
        if name != self.DEFAULT_USER and name not in self.users:
            raise UnknownAccessEntityError(f"UNKNOWN_USER: {name!r}")
        self.current_user = name

    # -- row policies ---------------------------------------------------------

    def create_row_policy(
        self,
        name: str,
        table: str,
        condition: str,
        restrictive: bool = False,
        to_all: bool = False,
        to_roles=(),
    ) -> None:
        self.row_policies[(name, table)] = RowPolicy(
            name, table, condition, restrictive, to_all, frozenset(to_roles)
        )

    def drop_row_policy(self, name: str, table: str) -> bool:
        return self.row_policies.pop((name, table), None) is not None

    # -- enforcement -----------------------------------------------------------

    @property
    def active(self) -> bool:
        """Enforcement engages only when the session actually configured
        access control — keeps the default path zero-overhead."""
        return bool(self.row_policies) or self.current_user != self.DEFAULT_USER

    def _effective_roles(self, user: str) -> set:
        return set(self.users.get(user, ()))

    def check_select(self, table: str) -> frozenset | None:
        """Raise AccessDeniedError unless the current user may SELECT from
        ``table``; return the granted column set (None = all columns).
        Mirrors ContextAccess::checkAccessImpl."""
        user = self.current_user
        if user == self.DEFAULT_USER:
            return None
        principals = [user, *self._effective_roles(user)]
        best: frozenset | None = None
        found = False
        for p in principals:
            tbl_grants = self.grants.get(p, {})
            for key in (table, "*"):
                if key in tbl_grants:
                    found = True
                    cols = tbl_grants[key]
                    if cols is None:
                        return None  # full-table grant wins
                    best = (best or frozenset()) | cols
        if not found:
            raise AccessDeniedError(
                f"ACCESS_DENIED: user {user!r} has no SELECT grant on "
                f"table {table!r}"
            )
        return best

    def policy_condition(self, table: str) -> str | None:
        """The mixed row-policy condition for the current user on ``table``
        (RowPolicyCache::ConditionsMixer), as a CH-SQL boolean expression;
        None = no policy applies = full access."""
        user = self.current_user
        roles = self._effective_roles(user)
        permissive, restrictive = [], []
        for pol in self.row_policies.values():
            if pol.table != table or not pol.applies_to(user, roles):
                continue
            (restrictive if pol.restrictive else permissive).append(
                f"({pol.condition})"
            )
        if not permissive and not restrictive:
            return None
        # OR() over zero permissive conditions folds to FALSE — exactly the
        # reference's makeASTForLogicalOr({}) (RowPolicyCache.cpp:58)
        parts = list(restrictive)
        parts.append(" OR ".join(permissive) if permissive else "FALSE")
        return " AND ".join(f"({p})" for p in parts)

    # -- introspection -----------------------------------------------------------

    def users_rows(self):
        return [
            (n, ",".join(sorted(r))) for n, r in sorted(self.users.items())
        ]

    def roles_rows(self):
        return [(n,) for n in sorted(self.roles)]

    def grants_rows(self):
        rows = []
        for p, tbls in sorted(self.grants.items()):
            for t, cols in sorted(tbls.items()):
                rows.append(
                    (p, t, "*" if cols is None else ",".join(sorted(cols)))
                )
        return rows

    def row_policies_rows(self):
        return [
            (
                p.name,
                p.table,
                "restrictive" if p.restrictive else "permissive",
                p.condition,
                "ALL" if p.to_all else ",".join(sorted(p.to_roles)) or "NONE",
            )
            for _, p in sorted(self.row_policies.items())
        ]

    def reset(self) -> None:
        self.__init__()


access_control = AccessControl()
