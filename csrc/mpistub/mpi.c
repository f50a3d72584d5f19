/* Single-process MPI stub implementation.  See mpi.h for scope/semantics. */
#include "mpi.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int g_initialized = 0;

static int type_size( MPI_Datatype t ) {
  int s = t < 0 ? -t : t;
  return s ? s : 1;
}

/* ------------------------------------------------------------------ */
/* In-process message matching: buffered sends, FIFO per tag.          */

typedef struct pending_send {
  int tag;
  int bytes;
  void* data;                /* owned copy */
  struct pending_send* next;
} pending_send;

struct mpistub_req {
  int is_recv;
  int done;
  int tag;
  void* buf;                 /* recv destination */
  int capacity_bytes;        /* recv capacity */
  int recvd_bytes;
  struct mpistub_req* next;  /* pending-recv list linkage */
};

static pending_send* g_sends_head = 0;
static pending_send* g_sends_tail = 0;
static struct mpistub_req* g_recvs_head = 0;
static struct mpistub_req* g_recvs_tail = 0;

static void deliver( struct mpistub_req* r, const void* data, int bytes ) {
  if( bytes > r->capacity_bytes ) {
    fprintf( stderr, "mpistub: message (%d B, tag %d) overflows recv buffer "
             "(%d B)\n", bytes, r->tag, r->capacity_bytes );
    abort();
  }
  memcpy( r->buf, data, (size_t)bytes );
  r->recvd_bytes = bytes;
  r->done = 1;
}

/* Pop the first pending send matching tag, or NULL. */
static pending_send* take_send( int tag ) {
  pending_send *p = g_sends_head, *prev = 0;
  while( p ) {
    if( p->tag == tag ) {
      if( prev ) prev->next = p->next; else g_sends_head = p->next;
      if( g_sends_tail == p ) g_sends_tail = prev;
      return p;
    }
    prev = p; p = p->next;
  }
  return 0;
}

/* Pop the first pending (unmatched) recv matching tag, or NULL. */
static struct mpistub_req* take_recv( int tag ) {
  struct mpistub_req *r = g_recvs_head, *prev = 0;
  while( r ) {
    if( !r->done && r->tag == tag ) {
      if( prev ) prev->next = r->next; else g_recvs_head = r->next;
      if( g_recvs_tail == r ) g_recvs_tail = prev;
      r->next = 0;
      return r;
    }
    prev = r; r = r->next;
  }
  return 0;
}

static void post_send( const void* buf, int bytes, int tag ) {
  struct mpistub_req* r = take_recv( tag );
  if( r ) { deliver( r, buf, bytes ); return; }
  {
    pending_send* p = (pending_send*)malloc( sizeof(*p) );
    p->tag = tag; p->bytes = bytes; p->next = 0;
    p->data = malloc( bytes ? (size_t)bytes : 1 );
    memcpy( p->data, buf, (size_t)bytes );
    if( g_sends_tail ) g_sends_tail->next = p; else g_sends_head = p;
    g_sends_tail = p;
  }
}

/* ------------------------------------------------------------------ */

int MPI_Init( int* argc, char*** argv ) {
  (void)argc; (void)argv;
  g_initialized = 1;
  return MPI_SUCCESS;
}

int MPI_Finalize( void ) { g_initialized = 0; return MPI_SUCCESS; }

int MPI_Initialized( int* flag ) { *flag = g_initialized; return MPI_SUCCESS; }

int MPI_Abort( MPI_Comm comm, int errorcode ) {
  (void)comm;
  fprintf( stderr, "mpistub: MPI_Abort(%d)\n", errorcode );
  exit( errorcode ? errorcode : 1 );
}

int MPI_Comm_dup( MPI_Comm comm, MPI_Comm* newcomm ) {
  *newcomm = comm; return MPI_SUCCESS;
}
int MPI_Comm_free( MPI_Comm* comm ) { *comm = MPI_COMM_NULL; return MPI_SUCCESS; }
int MPI_Comm_rank( MPI_Comm comm, int* rank ) { (void)comm; *rank = 0; return MPI_SUCCESS; }
int MPI_Comm_size( MPI_Comm comm, int* size ) { (void)comm; *size = 1; return MPI_SUCCESS; }

int MPI_Barrier( MPI_Comm comm ) { (void)comm; return MPI_SUCCESS; }

int MPI_Allreduce( const void* sendbuf, void* recvbuf, int count,
                   MPI_Datatype datatype, MPI_Op op, MPI_Comm comm ) {
  (void)op; (void)comm;
  if( sendbuf != MPI_IN_PLACE && sendbuf != recvbuf )
    memcpy( recvbuf, sendbuf, (size_t)count * (size_t)type_size( datatype ) );
  return MPI_SUCCESS;
}

int MPI_Allgather( const void* sendbuf, int sendcount, MPI_Datatype sendtype,
                   void* recvbuf, int recvcount, MPI_Datatype recvtype,
                   MPI_Comm comm ) {
  (void)recvcount; (void)recvtype; (void)comm;
  if( sendbuf != MPI_IN_PLACE && sendbuf != recvbuf )
    memcpy( recvbuf, sendbuf, (size_t)sendcount * (size_t)type_size( sendtype ) );
  return MPI_SUCCESS;
}

int MPI_Gather( const void* sendbuf, int sendcount, MPI_Datatype sendtype,
                void* recvbuf, int recvcount, MPI_Datatype recvtype,
                int root, MPI_Comm comm ) {
  (void)recvcount; (void)recvtype; (void)root; (void)comm;
  if( sendbuf != MPI_IN_PLACE && sendbuf != recvbuf )
    memcpy( recvbuf, sendbuf, (size_t)sendcount * (size_t)type_size( sendtype ) );
  return MPI_SUCCESS;
}

int MPI_Send( const void* buf, int count, MPI_Datatype datatype, int dest,
              int tag, MPI_Comm comm ) {
  (void)dest; (void)comm;
  post_send( buf, count * type_size( datatype ), tag );
  return MPI_SUCCESS;
}

int MPI_Recv( void* buf, int count, MPI_Datatype datatype, int source,
              int tag, MPI_Comm comm, MPI_Status* status ) {
  (void)source; (void)comm;
  pending_send* p = take_send( tag );
  int cap = count * type_size( datatype );
  if( !p ) {
    fprintf( stderr, "mpistub: MPI_Recv(tag %d) with no matching send posted "
             "— single-process deadlock\n", tag );
    abort();
  }
  if( p->bytes > cap ) {
    fprintf( stderr, "mpistub: MPI_Recv(tag %d) truncation (%d > %d B)\n",
             tag, p->bytes, cap );
    abort();
  }
  memcpy( buf, p->data, (size_t)p->bytes );
  if( status ) {
    status->MPI_SOURCE = 0; status->MPI_TAG = tag; status->MPI_ERROR = 0;
    status->_count_bytes = p->bytes;
  }
  free( p->data ); free( p );
  return MPI_SUCCESS;
}

int MPI_Irecv( void* buf, int count, MPI_Datatype datatype, int source,
               int tag, MPI_Comm comm, MPI_Request* request ) {
  (void)source; (void)comm;
  struct mpistub_req* r = (struct mpistub_req*)malloc( sizeof(*r) );
  r->is_recv = 1; r->done = 0; r->tag = tag; r->buf = buf;
  r->capacity_bytes = count * type_size( datatype );
  r->recvd_bytes = 0; r->next = 0;
  {
    pending_send* p = take_send( tag );
    if( p ) {
      deliver( r, p->data, p->bytes );
      free( p->data ); free( p );
    } else {
      if( g_recvs_tail ) g_recvs_tail->next = r; else g_recvs_head = r;
      g_recvs_tail = r;
    }
  }
  *request = r;
  return MPI_SUCCESS;
}

int MPI_Issend( const void* buf, int count, MPI_Datatype datatype, int dest,
                int tag, MPI_Comm comm, MPI_Request* request ) {
  (void)dest; (void)comm;
  struct mpistub_req* r = (struct mpistub_req*)malloc( sizeof(*r) );
  r->is_recv = 0; r->done = 1; r->tag = tag; r->buf = 0;
  r->capacity_bytes = 0; r->recvd_bytes = 0; r->next = 0;
  post_send( buf, count * type_size( datatype ), tag );
  *request = r;
  return MPI_SUCCESS;
}

int MPI_Wait( MPI_Request* request, MPI_Status* status ) {
  struct mpistub_req* r = *request;
  if( !r ) return MPI_SUCCESS;
  if( r->is_recv && !r->done ) {
    fprintf( stderr, "mpistub: MPI_Wait on unmatched recv (tag %d) — "
             "single-process deadlock\n", r->tag );
    abort();
  }
  if( status ) {
    status->MPI_SOURCE = 0; status->MPI_TAG = r->tag; status->MPI_ERROR = 0;
    status->_count_bytes = r->recvd_bytes;
  }
  /* Recv requests may still sit on the pending list if matched in place —
     matched recvs were removed at match time; unmatched+done is impossible.
     Done recvs reaching here were matched (removed), so free is safe. */
  free( r );
  *request = 0;
  return MPI_SUCCESS;
}

int MPI_Get_count( const MPI_Status* status, MPI_Datatype datatype,
                   int* count ) {
  *count = status ? status->_count_bytes / type_size( datatype ) : 0;
  return MPI_SUCCESS;
}
