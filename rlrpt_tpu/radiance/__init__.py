from rlrpt_tpu.radiance.volumes import (RadianceVolumes,  # noqa: F401
                                        build_radiance_volumes,
                                        expected_sarsa_update,
                                        irradiance_estimates, rebuild_cdf,
                                        sample_from_cdf)
from rlrpt_tpu.radiance.nn_search import find_closest_volume  # noqa: F401
