package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.resource.{ExecutorResourceRequests, ResourceProfile, ResourceProfileBuilder, TaskResourceRequests}

/** Stage-level scheduling for actor-style UDF stages (ref
  * `distributed_actor_pool_project.rs`: the reference schedules its
  * GPU-holding UDF actor pools onto GPU workers while the rest of the
  * plan runs on CPU workers).
  *
  * Spark's native form of the same idea is a stage-level
  * `ResourceProfile`: the ETL stages run under the default profile, and
  * ONLY the model-applying mapPartitions stage requests GPUs — on a
  * heterogeneous cluster (YARN/K8s/Standalone with dynamic allocation)
  * the scheduler places just that stage on GPU executors instead of
  * pinning GPUs to the whole job. Local mode cannot schedule custom
  * profiles (no executor acquisition), so the profile is exercised
  * end-to-end in the spec up to the scheduler's documented rejection. */
object StageResources {

  /** Attach a "this stage needs GPUs" profile to the RDD of a stateful
    * mapPartitions stage: `executorGpus` per acquired executor,
    * `gpusPerTask` claimed by each task (fractional shares like 0.25
    * express four model replicas per device — the actor-pool pattern). */
  def withTaskGpus[T](rdd: RDD[T], gpusPerTask: Double, executorGpus: Int,
      discoveryScript: String = ""): RDD[T] =
    rdd.withResources(gpuProfile(gpusPerTask, executorGpus, discoveryScript))

  def gpuProfile(gpusPerTask: Double, executorGpus: Int,
      discoveryScript: String = ""): ResourceProfile = {
    require(gpusPerTask > 0 && executorGpus > 0, "gpu amounts must be positive")
    val execReq = new ExecutorResourceRequests().resource("gpu", executorGpus, discoveryScript)
    val taskReq = new TaskResourceRequests().resource("gpu", gpusPerTask)
    new ResourceProfileBuilder().require(execReq).require(taskReq).build()
  }
}
