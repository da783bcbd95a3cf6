from sskd_tpu.models.bert import BertConfig, BertEncoder
from sskd_tpu.models.student import StudentModel
from sskd_tpu.models.teacher import TeacherModel

__all__ = ["BertConfig", "BertEncoder", "StudentModel", "TeacherModel"]
