"""Same drive but with a VANILLA SparkSession (UDF closures must import on
workers only via tables.load's addPyFile)."""
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
import drive_contract

if __name__ == "__main__":
    drive_contract.main(use_vanilla=True)
