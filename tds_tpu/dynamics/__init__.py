from tds_tpu.dynamics.kinematics import forward_kinematics, forward_kinematics_q, fk_links
from tds_tpu.dynamics.forward_dynamics import forward_dynamics
from tds_tpu.dynamics.integrator import integrate_euler, integrate_euler_qdd, integrate_q
