"""Authorizer SPI: pluggable authorization for pipeline CRUD.

Reference parity: server-api/.../security/Authorizer.java — a single
``authorize(datastream, operation, principal)`` hook with operations
CREATE/READ/UPDATE/DELETE, where READ additionally authorizes the OWNER
against the data source being consumed (Authorizer.java:18-36). The
PipelineManager consults the configured authorizer before create (CREATE
then READ for the owner, mirroring the reference's two-step create check),
pause/resume (UPDATE), and delete (DELETE); denial raises
PermissionError and leaves no state behind.
"""

from __future__ import annotations

from collections.abc import Callable
from enum import Enum

from brooklin_spark.model import PipelineSpec


class Operation(Enum):
    CREATE = "CREATE"
    READ = "READ"
    UPDATE = "UPDATE"
    DELETE = "DELETE"


#: authorize(spec, operation, principal) -> bool
Authorizer = Callable[[PipelineSpec, Operation, str], bool]


def allow_all(spec: PipelineSpec, op: Operation, principal: str) -> bool:
    """Default authorizer: everything allowed (reference default — the SPI
    is only enforced when an implementation is configured)."""
    return True


def owner_only(spec: PipelineSpec, op: Operation, principal: str) -> bool:
    """Simple policy for tests/small deployments: mutations require the
    caller to be the pipeline's declared owner (metadata['owner']); a
    pipeline without an owner is open."""
    owner = (spec.metadata or {}).get("owner")
    if op is Operation.READ or owner is None:
        return True
    return principal == owner


def check(
    authorizer: Authorizer, spec: PipelineSpec, op: Operation, principal: str
) -> None:
    if not authorizer(spec, op, principal):
        raise PermissionError(
            f"principal {principal!r} is not authorized to {op.value} "
            f"pipeline {spec.name!r}"
        )
