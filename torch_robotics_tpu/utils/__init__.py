from .files import (get_configs_path, get_data_path, get_objects_path,
                    get_robot_path, get_urdf_path, load_yaml)
