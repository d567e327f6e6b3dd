from ns_gls_tpu.models.base import BoundaryDescriptor, SimulationBase  # noqa
from ns_gls_tpu.models.channel import SimulationChannel  # noqa
from ns_gls_tpu.models.cylinder import SimulationCylinder  # noqa
from ns_gls_tpu.models.rotation import SimulationRotation  # noqa
from ns_gls_tpu.models.sphere import SimulationSphere  # noqa


def make_simulation(name: str, dim: int):
    table = {
        "channel": SimulationChannel,
        "cylinder": SimulationCylinder,
        "rotation": SimulationRotation,
        "sphere": SimulationSphere,
    }
    if name not in table:
        raise ValueError(f"unknown simulation '{name}'")
    return table[name](dim)
