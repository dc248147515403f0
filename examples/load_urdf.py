#!/usr/bin/env python
"""Parse a URDF into UrdfStructures, convert to a MultiBody, inspect it.

The tds_tpu analog of the reference's python/examples/b_urdf_structs_example.py
and e_load_urdf.py: parse -> structures -> multibody -> forward kinematics.

Run: PYTHONPATH=. python examples/load_urdf.py [name.urdf]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tds_tpu.dynamics.kinematics import forward_kinematics_q
from tds_tpu.urdf.converter import convert_to_multibody
from tds_tpu.urdf.parser import parse_urdf_file
from tds_tpu.utils.file_utils import find_file


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "laikago/laikago_toes_zup_xyz_xyzrot.urdf"
    path = find_file(name)
    urdf = parse_urdf_file(path)
    print(f"robot: {urdf.robot_name}")
    print(f"  links:  {len(urdf.links)}")
    print(f"  joints: {len(urdf.joints)}")
    for j in urdf.joints[:8]:
        print(f"    {j.joint_name:<28} type={j.joint_type}")
    if len(urdf.joints) > 8:
        print(f"    ... and {len(urdf.joints) - 8} more")

    model, geoms = convert_to_multibody(urdf, is_floating=False)
    print(f"multibody: {model.num_links} links, dof_q={model.dof_q}, "
          f"dof_qd={model.dof_qd}, {len(geoms)} collision geoms")

    q = model.zero_q()
    base_x, link_x_world, _ = forward_kinematics_q(model, q)
    tip = link_x_world[-1].pos
    print(f"zero-pose FK: last link origin at {tip}")


if __name__ == "__main__":
    main()
