"""lbc-tpu: TPU-native batched driving-world framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
dotchen/LearningByCheating (CoRL 2019). The reference's client/server hot
loop (one CARLA UE4 server per env, 10 Hz TCP RPC) is replaced by a single
jitted, vmapped, mesh-sharded `step` function over device-resident world
state.
"""

__version__ = "0.1.0"
