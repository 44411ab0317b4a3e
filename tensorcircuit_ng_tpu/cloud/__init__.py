"""Cloud/QPU access layer (reference ``cloud/``): provider-agnostic API.

Providers ship as modules registering device backends; the ``local``
provider executes on the in-process simulator so application code written
against :func:`~tensorcircuit_ng_tpu.cloud.apis.submit_task` /
``batch_expectation_ps`` runs without network access.
"""

from . import apis
from . import abstraction
from . import local
from . import wrapper
from .apis import set_provider, set_device, set_token, list_devices, submit_task
from .wrapper import batch_expectation_ps, batch_submit_template

__all__ = [
    "apis",
    "abstraction",
    "local",
    "wrapper",
    "set_provider",
    "set_device",
    "set_token",
    "list_devices",
    "submit_task",
    "batch_expectation_ps",
    "batch_submit_template",
]
